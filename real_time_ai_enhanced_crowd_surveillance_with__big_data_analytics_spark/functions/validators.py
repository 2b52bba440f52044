"""Registration validators as pure Column expressions (SURVEY.md F1-F5;
reference crowd_surveillance/app/verify.py:6-50).

No UDFs: every rule is an rlike/length expression that stays inside
whole-stage codegen. The password rule (verify.py:12-25) uses lookahead
in the reference; Spark's Java regex supports it, but the decomposed
AND-of-conditions form is used on both engine and oracle sides because
DuckDB's RE2 has no lookahead — semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PASSWORD_ALLOWED = r"^[A-Za-z\d@$!#%*?&]{6,20}$"


def valid_name(c: Column) -> Column:
    """reference verify.py:6-10: name.isalpha() and len(name) > 2.

    Documented divergence: Python ``isalpha`` accepts all Unicode
    letters; this implementation pins ASCII letters (the reference's
    auth data is ASCII) so the SQL form is engine-portable.
    """
    return c.rlike("^[A-Za-z]+$") & (F.length(c) > 2)


def valid_password(c: Column) -> Column:
    """reference verify.py:12-25: >=1 lower, upper, digit, special;
    6-20 chars from the allowed alphabet."""
    return (
        c.rlike(PASSWORD_ALLOWED)
        & c.rlike("[a-z]")
        & c.rlike("[A-Z]")
        & c.rlike("[0-9]")
        & c.rlike("[@$!#%*?&]")
    )


def valid_contact(c: Column) -> Column:
    """reference verify.py:33-38: re.fullmatch('[6-9][0-9]{9}')."""
    return c.rlike("^[6-9][0-9]{9}$")


def validation_error(
    first_name: Column, last_name: Column, password: Column, contact: Column
) -> Column:
    """First-failing-rule dispatcher (reference verify.py:40-50 checks
    rules in order and returns the first error)."""
    return (
        F.when(~valid_name(first_name), F.lit("invalid_first_name"))
        .when(~valid_name(last_name), F.lit("invalid_last_name"))
        .when(~valid_password(password), F.lit("invalid_password"))
        .when(~valid_contact(contact), F.lit("invalid_contact"))
        .otherwise(F.lit(None).cast("string"))
    )
