from tiflow_spark.sinks.storage import (  # noqa: F401
    StorageSinkConfig,
    read_storage_sink,
    storage_layout_stats,
    write_storage_sink,
)
