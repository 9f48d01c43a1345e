from .inspect import explain_str, plan_asserts  # noqa: F401
