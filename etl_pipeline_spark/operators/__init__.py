from . import lww, validate  # noqa: F401
