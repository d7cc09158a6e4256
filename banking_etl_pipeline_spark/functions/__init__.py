"""Scalar column-expression helpers shared by the operator modules."""

from .numeric import ftrunc, sql_ftrunc  # noqa: F401
