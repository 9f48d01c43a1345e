from .export import export_csv  # noqa: F401
