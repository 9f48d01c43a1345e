from .minilake import CommitConflict, MergeResult, MiniLakeTable  # noqa: F401
