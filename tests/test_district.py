"""District extraction parity tests (SURVEY §2.2.1 — the highest-risk item).

The expected values are computed by a small pandas model implementing the
documented semantics of ingestor_precinct.py:165-183: three sequential
passes over a mutating frame; each pass uppercases + literal-rsplits
matched rows on the LAST 'DISTRICT'.
"""

from __future__ import annotations

import pandas as pd
import pytest

from results_ingestor_spark.operators.district import extract_district

CASES = [
    "NC HOUSE OF REPRESENTATIVES DISTRICT 10",   # number
    "Superior Court District 9B",                # number, mixed case
    "COUNTY COMMISSIONER DISTRICT B",            # letter
    "SANITARY DISTRICT IV",                      # roman
    "Sanitary District iv",                      # roman lower-case
    "US SENATE",                                 # no match → untouched
    "DISTRICT COURT JUDGE DISTRICT 26",          # double → split on LAST
    "District Court Judge",                      # contains DISTRICT, no regime → untouched
    "county commissioner district c",            # all lower
    "DISTRICT 5 COMMISSIONER DISTRICT B",        # pass-1 match, letter after split
    "BOARD OF EDUCATION DISTRICT VIII",          # roman 3-char
    "JUDGE DISTRICT IX",                         # roman IX
    "SOIL AND WATER DISTRICT A1",                # letter then digit: [a-z]\b fails (A1), \d fails
    "FIRE DISTRICT V",                           # roman V
]


def _pandas_model(names: list[str]) -> pd.DataFrame:
    """Reference semantics, per SURVEY §2.2.1 (clean-room reimplementation)."""
    df = pd.DataFrame({"contest_name": names})
    df["district"] = None
    # non-capturing roman group: ``str.contains`` only ever asks
    # "does it match", and a capturing group draws a pandas warning
    # (scheduled behavior change) that would break this model when
    # pandas flips the default (VERDICT r6 item 8)
    patterns = [r"DISTRICT \d", r"DISTRICT [a-z]\b",
                r"DISTRICT (?:IX|I?V|V?I{1,3})\b"]
    for pat in patterns:
        idx = df["contest_name"].str.contains(pat, case=False)
        if idx.any():
            parts = df.loc[idx, "contest_name"].str.upper().str.rsplit(
                "DISTRICT", n=1, expand=True)
            df.loc[idx, "contest_name"] = parts[0]
            df.loc[idx, "district"] = parts[1]
    return df


@pytest.fixture(scope="module")
def extracted(spark):
    sdf = spark.createDataFrame([(c,) for c in CASES], ["contest_name"])
    rows = extract_district(sdf, force=True).collect()
    return {i: (r["contest_name"], r["district"])
            for i, r in enumerate(rows)}


def test_matches_pandas_model(spark):
    sdf = spark.createDataFrame([(c,) for c in CASES], ["contest_name"])
    got = [(r["contest_name"], r["district"])
           for r in extract_district(sdf, force=True).collect()]
    model = _pandas_model(CASES)
    want = [(cn, d if isinstance(d, str) else None)
            for cn, d in zip(model["contest_name"], model["district"])]
    assert got == want


def test_number_regime(extracted):
    assert extracted[0] == ("NC HOUSE OF REPRESENTATIVES ", " 10")


def test_district_keeps_leading_space_and_suffix(extracted):
    assert extracted[1] == ("SUPERIOR COURT ", " 9B")


def test_letter_regime(extracted):
    assert extracted[2] == ("COUNTY COMMISSIONER ", " B")


def test_roman_regime_case_insensitive(extracted):
    assert extracted[3] == ("SANITARY ", " IV")
    assert extracted[4] == ("SANITARY ", " IV")


def test_non_matching_untouched(extracted):
    assert extracted[5] == ("US SENATE", None)
    # contains DISTRICT but no number/letter/roman suffix → untouched,
    # original mixed case preserved
    assert extracted[7] == ("District Court Judge", None)


def test_double_district_splits_on_last(extracted):
    assert extracted[6] == ("DISTRICT COURT JUDGE ", " 26")
    assert extracted[9] == ("DISTRICT 5 COMMISSIONER ", " B")


def test_trigger_predicate(spark):
    # existing non-empty district → extraction skipped entirely
    sdf = spark.createDataFrame(
        [("CITY COUNCIL DISTRICT 4", "7")], ["contest_name", "district"])
    out = extract_district(sdf).collect()[0]
    assert (out["contest_name"], out["district"]) == ("CITY COUNCIL DISTRICT 4", "7")
    # all-empty district column → extraction runs
    sdf2 = spark.createDataFrame(
        [("CITY COUNCIL DISTRICT 4", "")], ["contest_name", "district"])
    out2 = extract_district(sdf2).collect()[0]
    assert (out2["contest_name"], out2["district"]) == ("CITY COUNCIL ", " 4")
