"""Property tests: Column-expression validators agree with the
reference's Python implementations (verify.py:6-50) on arbitrary
strings (SURVEY.md §5.4)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.functions.validators import (
    valid_contact,
    valid_name,
    valid_password,
)

# reference implementations (crowd_surveillance/app/verify.py:6-38)
PASSWORD_RE = re.compile(
    r"^(?=.*[a-z])(?=.*[A-Z])(?=.*\d)(?=.*[@$!%*#?&])[A-Za-z\d@$!#%*?&]{6,20}$"
)


def ref_name(s: str) -> bool:
    return s.isalpha() and len(s) > 2 and s.isascii()


def ref_password(s: str) -> bool:
    return bool(PASSWORD_RE.search(s))


def ref_contact(s: str) -> bool:
    return bool(re.fullmatch(r"[6-9][0-9]{9}", s))


ALPHABET = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019@$!#%*?& \t-_ñ")
    ),
    max_size=25,
)


def _check(spark, strings, col_fn, ref_fn):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r.s: r.ok for r in df.select("s", col_fn(F.col("s")).alias("ok")).collect()}
    for s in strings:
        assert got[s] == ref_fn(s), repr(s)


@settings(max_examples=10, deadline=None)
@given(st.lists(ALPHABET, min_size=1, max_size=30, unique=True))
def test_name_validator_matches_reference(spark, strings):
    _check(spark, strings, valid_name, ref_name)


@settings(max_examples=10, deadline=None)
@given(st.lists(ALPHABET, min_size=1, max_size=30, unique=True))
def test_password_validator_matches_reference(spark, strings):
    _check(spark, strings, valid_password, ref_password)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from(list("0123456789x")), max_size=12),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_contact_validator_matches_reference(spark, strings):
    _check(spark, strings, valid_contact, ref_contact)
