"""End-to-end golden: Spark pipeline vs the pure-Python reference oracle
(tests/ref_oracle.py) on the sf0.001 corpus, plus the README invariants."""

from wikipedia_wikidata_spark.plans.importance import (
    run_importance,
    run_importance_sorted,
)
from wikipedia_wikidata_spark.sources.synth import synth_facts

from .conftest import SF_DIR_SMALL
from .ref_oracle import reference_importance


def test_pipeline_matches_python_reference_oracle(spark):
    got = {
        (r.language, r.type, r.title): (r.importance, r.wikidata_id)
        for r in run_importance(spark, SF_DIR_SMALL).collect()
    }
    exp = reference_importance(synth_facts(0.001))
    assert set(got) == set(exp), (
        f"key diff: extra={sorted(set(got) - set(exp))[:5]} "
        f"missing={sorted(set(exp) - set(got))[:5]}"
    )
    for k, (imp, wid) in exp.items():
        gimp, gwid = got[k]
        assert gwid == wid, (k, gwid, wid)
        # bit-exact, not isclose: engine and oracle share numpy's log10
        # (plans/importance.log10_ratio_floor), which the byte-exact TSV
        # golden below relies on
        assert gimp == imp, (k, repr(gimp), repr(imp))


def test_tsv_bytes_match_python_reference_oracle(spark, tmp_path_factory):
    """F9 byte-exact golden: the full sf0.001 TSV artifact equals the pure-
    Python reference oracle's formatted output byte for byte (header, tab
    separation, sort order, repr float rendering incl. the 1e-10 floor)."""
    from collections import Counter

    from wikipedia_wikidata_spark.sinks import write_importance_tsv

    out = str(tmp_path_factory.mktemp("tsv_golden") / "wikimedia_importance.tsv.gz")
    write_importance_tsv(run_importance(spark, SF_DIR_SMALL), out)
    import gzip

    with gzip.open(out, "rt") as f:
        got_text = f.read()

    exp = reference_importance(synth_facts(0.001))
    sizes = Counter(L for (L, _, _) in exp)
    rows = sorted(
        ((L, ty, t, imp, wid) for (L, ty, t), (imp, wid) in exp.items()),
        key=lambda r: (-sizes[r[0]], r[1], r[2]),
    )
    exp_text = "language\ttype\ttitle\timportance\twikidata_id\n" + "".join(
        f"{L}\t{ty}\t{t}\t{imp!r}\t{wid}\n" for L, ty, t, imp, wid in rows
    )
    assert got_text == exp_text


def test_pipeline_at_39_languages(spark):
    """The reference's full production configuration: 39 languages
    (config/languages.txt). The engine is language-count-agnostic — the
    39x39 othercount matrix (the reference's 2:20h UPDATE loop,
    steps/wikipedia_process.sh:52-71) stays ONE grouped-SUM shuffle — and
    the result matches the pure-Python oracle exactly at L=39."""
    from wikipedia_wikidata_spark.config import LANGUAGES_FULL
    from wikipedia_wikidata_spark.sources.synth import ensure_spans_data

    assert len(LANGUAGES_FULL) == 39
    d = ensure_spans_data(0.004, LANGUAGES_FULL)
    got = {
        (r.language, r.type, r.title): (r.importance, r.wikidata_id)
        for r in run_importance(spark, d, languages=LANGUAGES_FULL).collect()
    }
    exp = reference_importance(
        synth_facts(0.004, LANGUAGES_FULL), LANGUAGES_FULL
    )
    assert set(got) == set(exp), (
        f"key diff: extra={sorted(set(got) - set(exp))[:5]} "
        f"missing={sorted(set(exp) - set(got))[:5]}"
    )
    for k, (imp, wid) in exp.items():
        gimp, gwid = got[k]
        assert gwid == wid and gimp == imp, (k, gimp, imp, gwid, wid)
    langs_out = {L for (L, _, _) in got}
    assert len(langs_out) >= 30, f"only {len(langs_out)} languages produced rows"


def test_invariants_and_sink_order(spark):
    rows = run_importance_sorted(spark, SF_DIR_SMALL).collect()
    assert len(rows) > 0
    # README.md:65 — (language, title) unique
    keys = [(r.language, r.title) for r in rows]
    assert len(keys) == len(set(keys))
    # README.md:71 — importance in [1e-10, 1], never 0
    assert all(1e-10 <= r.importance <= 1.0 for r in rows)
    # steps/output.sh:118-123 — ORDER BY language-size DESC, type, title
    from collections import Counter

    sizes = Counter(r.language for r in rows)
    sort_key = [(-sizes[r.language], r.type, r.title) for r in rows]
    assert sort_key == sorted(sort_key)
