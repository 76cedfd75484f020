"""Iceberg-native interoperability: export a MoonTable snapshot as genuine
Apache Iceberg v2 metadata (JSON metadata + Avro manifest lists/manifests +
spec-schema position-delete parquet) that any external Iceberg reader can
consume, plus an independent spec-walking reader used to prove the
round-trip.

Reference behavior being re-created (public Iceberg spec +
iceberg_table_syncer.rs:723-838 fast-append commit,
table/iceberg/deletion_vector.rs:1-30 delete-blob properties,
file_catalog.rs:590-673 version-hint protocol).
"""

from moonlink_spark.iceberg.expire import expire_iceberg_mirror  # noqa: F401
from moonlink_spark.iceberg.export import export_iceberg  # noqa: F401
from moonlink_spark.iceberg.importer import import_iceberg  # noqa: F401
from moonlink_spark.iceberg.reader import read_iceberg_scan  # noqa: F401
