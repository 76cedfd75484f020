from moonlink_spark.catalog.catalog import FileCatalog
from moonlink_spark.catalog.metadata import DataFile, DeleteFile, Snapshot, TableMetadata

__all__ = ["FileCatalog", "DataFile", "DeleteFile", "Snapshot", "TableMetadata"]
