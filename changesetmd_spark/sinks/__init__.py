from .upsert import latest_per_key, upsert_parquet
from .store import ChangesetStore

__all__ = ["latest_per_key", "upsert_parquet", "ChangesetStore"]
