from .upsert import ConcurrentUpsertError, latest_per_key, upsert_parquet
from .store import ChangesetStore

__all__ = [
    "ConcurrentUpsertError",
    "latest_per_key",
    "upsert_parquet",
    "ChangesetStore",
]
