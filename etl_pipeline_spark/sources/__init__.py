from . import changelog, genlog  # noqa: F401
