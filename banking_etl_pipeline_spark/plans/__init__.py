from .inspect import plan_of, pushed_filters, read_schema  # noqa: F401
