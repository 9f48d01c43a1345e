from . import dedup, lww, multimodal, similarity, validate  # noqa: F401
