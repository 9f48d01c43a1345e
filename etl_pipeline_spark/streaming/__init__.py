from .ingest import replay_files, run_ingest_stream  # noqa: F401
