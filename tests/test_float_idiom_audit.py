"""Pins for the standing float-idiom lint (tools/float_idiom_audit.py)
— the round-6 audit that closed the cross-engine divergence class
behind round 5's one driver-red cell.  Two properties matter: the repo
is clean TODAY, and the detector would actually catch a regression.
"""

from __future__ import annotations

from tools.float_idiom_audit import _idiom_a, _round_scales


def test_repo_is_clean_of_both_idioms():
    assert _idiom_a() == []
    # idiom B runs inside main() against the live registry; import and
    # evaluate it the same way
    from tools.float_idiom_audit import _idiom_b
    assert _idiom_b() == []


def test_round_scale_parser_handles_nested_commas():
    # the round-5 false-positive class: nested DECIMAL(12,2) commas
    sql = ("SELECT round(CAST(x AS DECIMAL(12,2)) / n, 9) AS r, "
           "round(covar_samp(a, b), 6) AS c FROM t")
    assert _round_scales(sql, "round(") == {9, 6}
    # non-literal last arg is ignored, not misparsed
    assert _round_scales("round(x, k)", "round(") == set()
    py = 'F.round(F.sum(F.col("a") * F.col("b")) / F.lit(2.0), 9)'
    assert _round_scales(py, "F.round(") == {9}


def test_idiom_a_detector_catches_planted_pattern(tmp_path, monkeypatch):
    import glob as _glob

    import tools.float_idiom_audit as aud

    planted = tmp_path / "planted_q.py"
    planted.write_text(
        'x = (F.col("a") / F.lit(100)).cast("long").alias("bucket")\n')
    monkeypatch.setattr(
        _glob, "glob", lambda pat: [str(planted)]
        if "plans" in pat else [])
    hits = aud._idiom_a()
    assert len(hits) == 1 and "planted_q.py" in hits[0]
