"""Error-path parity (`tests/test_errors.py` analog) + physical-plan
regression: pruning / partial-agg / broadcast shapes must not rot."""

import re

import pytest

from camelot_spark.config import make_config, validate_input


class TestErrorPaths:
    def test_unknown_flavor(self):
        """`camelot/io.py` raises NotImplementedError for bad flavor."""
        with pytest.raises(NotImplementedError, match="lattice.*stream|stream.*lattice|Unknown flavor"):
            make_config("bogus")

    def test_stream_rejects_lattice_kwargs(self):
        with pytest.raises(ValueError, match="cannot be used with flavor"):
            validate_input({"line_scale": 40}, flavor="stream")
        with pytest.raises(ValueError, match="copy_text"):
            make_config("stream", copy_text=["v"])

    def test_lattice_rejects_stream_kwargs(self):
        with pytest.raises(ValueError, match="row_tol"):
            make_config("lattice", row_tol=5)

    def test_areas_columns_length_mismatch(self):
        """`camelot/parsers/stream.py:72-74` equality check."""
        with pytest.raises(ValueError, match="table_areas and columns"):
            make_config("stream", table_areas=["0,0,10,10", "0,0,5,5"], columns=["1,2"])

    def test_job_kwarg_parsing(self):
        from jobs.extract_job import parse_kw

        kw = parse_kw(["row_tol=5", "split_text=true", "strip_text=.,",
                       "shift_text=l,t", "edge_tol=49.5"])
        assert kw == {"row_tol": 5, "split_text": True, "strip_text": ".,",
                      "shift_text": ["l", "t"], "edge_tol": 49.5}

    def test_export_bad_format(self):
        from camelot_spark import sinks

        with pytest.raises(ValueError, match="not supported"):
            sinks._FORMATS["csv"] and sinks.export(None, "/tmp/x", fmt="xlsx")


def _read_schema(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    return m.group(1) if m else ""


class TestPlanShapes:
    """Plan-quality regressions: these properties are what make the
    pipeline hold at 100 TB; a refactor that loses them must fail here."""

    def test_corpus_query_prunes_to_doc_id(self, spark):
        import __spark_entry__ as e

        df = e.queries()["extract_stream_corpus"](spark, "/root/testdata/sf0.001")
        assert _read_schema(df) == "struct<doc_id:bigint>"

    def test_dedup_prunes_columns(self, spark):
        import __spark_entry__ as e

        df = e.queries()["dedup_exact"](spark, "/root/testdata/sf0.001")
        schema = _read_schema(df)
        assert "text" in schema and "source" in schema and "lang" not in schema
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan  # map-side partial aggregation

    def test_ann_broadcasts_query_vector(self, spark):
        import __spark_entry__ as e

        df = e.queries()["ann_topk"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan

    def test_simhash_signature_is_shuffle_free_at_scale(self, spark):
        """The signature computation itself must not explode tokens into
        a shuffle; the only allowed Exchange comes from the local
        small-file spread() (round-robin, no key)."""
        from camelot_spark.tdp.dedup import simhash64

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = simhash64(docs)._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" not in plan
        assert "Generate" not in plan  # no explode
