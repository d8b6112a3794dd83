from plwordnet_spark.storage.snapshots import SnapshotStore  # noqa: F401
