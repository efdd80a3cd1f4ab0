"""Constraint and key checks (SURVEY.md §2.4, §2.5)."""

from .constraints import ConstraintCheck, compile_constraints
from .keys import check_foreign_key, check_primary_key, check_unique_key

__all__ = [
    "ConstraintCheck",
    "compile_constraints",
    "check_primary_key",
    "check_unique_key",
    "check_foreign_key",
]
