from .store import SnapshotStore, stream_ingest  # noqa: F401
