from similarities_spark.plans.manifest import (
    write_manifest,
    read_manifest,
    manifest_path,
    completed_buckets,
)

__all__ = ["write_manifest", "read_manifest", "manifest_path", "completed_buckets"]
