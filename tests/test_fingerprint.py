"""Winnowing rolling-hash fingerprints (llm/fingerprint.py): the
MOSS guarantee, edit locality, stop-fingerprint capping."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.llm import fingerprint as FP


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


SHARED = "the winnowing guarantee covers any run of twenty-three chars"
PAD_A = "completely unrelated prefix material about spark physical plans "
PAD_B = "different framing text discussing parquet footer statistics and "


class TestWinnowFingerprints:
    def test_guarantee_shared_run_shares_fingerprint(self, spark):
        """Any shared normalized substring of length k+window-1 (=23)
        must produce at least one shared fingerprint — the winnowing
        selection guarantee."""
        df = _docs(
            spark,
            [(1, PAD_A + SHARED), (2, PAD_B + SHARED + " plus a suffix")],
        )
        fps = FP.winnow_fingerprints(df)
        by_doc = {}
        for r in fps.collect():
            by_doc.setdefault(r.id, set()).add(r.fingerprint)
        assert by_doc[1] & by_doc[2], "shared 23+-char run must collide"

    def test_unrelated_docs_share_nothing(self, spark):
        df = _docs(
            spark,
            [
                (1, "alpha bravo charlie delta echo foxtrot golf hotel india"),
                (2, "zulu yankee xray whiskey victor uniform tango sierra"),
            ],
        )
        fps = FP.winnow_fingerprints(df)
        by_doc = {}
        for r in fps.collect():
            by_doc.setdefault(r.id, set()).add(r.fingerprint)
        assert not (by_doc.get(1, set()) & by_doc.get(2, set()))

    def test_short_and_null_docs_yield_no_rows(self, spark):
        df = _docs(spark, [(1, "tiny"), (2, None), (3, "   ")])
        assert FP.winnow_fingerprints(df).count() == 0

    def test_fingerprints_are_normalization_invariant(self, spark):
        df = _docs(
            spark,
            [(1, "Some  Document\tWith   odd SPACING here to fingerprint"),
             (2, "some document with odd spacing here to fingerprint")],
        )
        rows = FP.winnow_fingerprints(df).collect()
        a = sorted(r.fingerprint for r in rows if r.id == 1)
        b = sorted(r.fingerprint for r in rows if r.id == 2)
        assert a == b and a

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, f"document number {i} shares this long boilerplate tail "
                    "that every page of the crawl carries") for i in range(20)]
        one = sorted(map(tuple, FP.winnow_fingerprints(_docs(spark, rows)).collect()))
        other = sorted(
            map(
                tuple,
                FP.winnow_fingerprints(
                    _docs(spark, rows[::-1]).repartition(7)
                ).collect(),
            )
        )
        assert one == other


class TestWinnowOverlapPairs:
    def test_contaminated_pair_found_unrelated_not(self, spark):
        df = _docs(
            spark,
            [
                (1, PAD_A + SHARED),
                (2, PAD_B + SHARED),
                (3, "entirely novel corpus content with no quoted overlap at "
                    "all in any window of it"),
            ],
        )
        pairs = {
            (r.doc_a, r.doc_b): r.shared_fps
            for r in FP.winnow_overlap_pairs(df, min_shared=1).collect()
        }
        assert (1, 2) in pairs
        assert all(3 not in p for p in pairs)

    def test_stop_fingerprints_capped_by_max_df(self, spark):
        """A fingerprint present in every doc (boilerplate) must be
        dropped once the corpus exceeds max_df — no quadratic pair
        blow-up from a universal footer."""
        boiler = " all pages carry this exact same legal footer text block"
        # per-doc unique letter runs so even the k-grams SPANNING the
        # body/footer boundary are unique per doc — only the footer
        # itself is shared, and it is shared by all 26 docs
        rows = [(i, "abcdefghijklmnopqrstuvwxyz"[i] * 30 + boiler)
                for i in range(26)]
        pairs = FP.winnow_overlap_pairs(
            _docs(spark, rows), min_shared=1, max_df=10
        ).count()
        # the footer fingerprints exceed df=10 → dropped; the unique
        # bodies share nothing → no pairs at all
        assert pairs == 0
        # same corpus, cap lifted: the 26-doc footer clique appears
        uncapped = FP.winnow_overlap_pairs(
            _docs(spark, rows), min_shared=1, max_df=1000
        ).count()
        assert uncapped == 26 * 25 // 2


class TestWinnowStore:
    def test_store_roundtrip_flags_contamination(self, spark, tmp_path):
        eval_docs = _docs(
            spark,
            [(0, PAD_A + SHARED), (2, "a clean benchmark question about "
                                       "gravity and orbital mechanics")],
        )
        path = str(tmp_path / "wstore")
        FP.build_winnow_store(eval_docs, path)
        batch = _docs(
            spark,
            [
                (1, PAD_B + SHARED),  # quotes eval doc 0
                (3, "entirely original training text with no quoted "
                    "benchmark content anywhere inside"),
            ],
        )
        hits = {
            (r.new_id, r.eval_id)
            for r in FP.contamination_against_store(
                spark, path, batch, min_shared=1
            ).collect()
        }
        assert (1, 0) in hits
        assert all(nid != 3 for nid, _ in hits)

    def test_query_uses_store_geometry_not_defaults(self, spark, tmp_path):
        """A store built with non-default k must still match — the
        batch is fingerprinted with the STORE's params from meta."""
        path = str(tmp_path / "wstore_k5")
        FP.build_winnow_store(
            _docs(spark, [(0, PAD_A + SHARED)]), path, k=5, window=8
        )
        hits = FP.contamination_against_store(
            spark, path, _docs(spark, [(1, PAD_B + SHARED)]), min_shared=1
        )
        assert hits.count() >= 1

    def test_append_is_idempotent_and_extends_coverage(self, spark, tmp_path):
        path = str(tmp_path / "wstore_app")
        FP.build_winnow_store(_docs(spark, [(0, PAD_A + SHARED)]), path)
        newer = _docs(
            spark,
            [(2, "a freshly added benchmark prompt about tidal locking "
                 "and resonance chains in exoplanet systems")],
        )
        assert FP.append_to_winnow_store(spark, path, newer) == 1
        assert FP.append_to_winnow_store(spark, path, newer) == 0  # replay
        hits = FP.contamination_against_store(
            spark,
            path,
            _docs(spark, [(9, "students asked about tidal locking and "
                              "resonance chains in exoplanet systems")]),
            min_shared=1,
        )
        assert (9, 2) in {(r.new_id, r.eval_id) for r in hits.collect()}

    def test_eval_boilerplate_capped_by_meta_max_df(self, spark, tmp_path):
        """An eval suite whose every item carries the same preamble:
        the preamble fingerprints exceed max_df and must not flag
        every training doc that happens to quote the preamble."""
        preamble = " please answer the following question carefully: "
        evals = [(i * 2, "abcdefghijklm"[i] * 25 + preamble) for i in range(12)]
        path = str(tmp_path / "wstore_cap")
        FP.build_winnow_store(_docs(spark, evals), path, max_df=5)
        batch = _docs(spark, [(99, "some training doc that merely says" + preamble)])
        hits = FP.contamination_against_store(spark, path, batch, min_shared=1)
        assert hits.count() == 0


def test_ingest_gate_rejects_eval_contamination(spark, tmp_path):
    """The composed front door: with an eval store attached, a batch
    doc quoting benchmark material never reaches the warehouse."""
    from etl_procedure_codes_crawler_spark.llm import neardup_store as NS
    from etl_procedure_codes_crawler_spark.streaming.incremental import (
        stream_ingest_with_neardup,
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    source = tmp_path / "incoming"
    source.mkdir()
    wh, nd, ev, ck = (
        str(tmp_path / "wh"), str(tmp_path / "nd"),
        str(tmp_path / "ev"), str(tmp_path / "ck"),
    )
    schema_str = "doc_id bigint, text string"
    NS.build_minhash_store(spark.createDataFrame([], schema_str), nd)
    FP.build_winnow_store(_docs(spark, [(1000, PAD_A + SHARED)]), ev)

    import glob, os, shutil, tempfile

    staging = tempfile.mkdtemp()
    batch = _docs(
        spark,
        [
            (1, PAD_B + SHARED),  # quotes the eval doc → must be rejected
            # min_shared=1: even ONE common 8-gram flags, so this text
            # shares no 8-char substring with the eval doc (no common
            # long words, no common phrases)
            (2, "zq fresh corpus rows kept apart from bench suites, "
                "wholly new words only, full stop here"),
        ],
    )
    batch.repartition(1).write.mode("overwrite").parquet(staging)
    shutil.copy(
        glob.glob(os.path.join(staging, "part-*.parquet"))[0],
        os.path.join(str(source), "b1.parquet"),
    )
    shutil.rmtree(staging, ignore_errors=True)

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    q = stream_ingest_with_neardup(
        spark, str(source), schema, wh, nd, ck,
        threshold=0.5, eval_store_path=ev, eval_min_shared=1,
    )
    q.awaitTermination()
    assert {r.doc_id for r in spark.read.parquet(wh).collect()} == {2}


def test_append_records_zero_fingerprint_docs(spark, tmp_path):
    """A doc too short to fingerprint must still be REMEMBERED: the
    next append's anti-join skips it (id-idempotent) instead of
    re-fingerprinting it forever."""
    path = str(tmp_path / "wstore_short")
    FP.build_winnow_store(_docs(spark, [(0, PAD_A + SHARED)]), path)
    shorty = _docs(spark, [(7, "tiny")])  # < k=8 normalized chars
    assert FP.append_to_winnow_store(spark, path, shorty) == 1
    assert FP.append_to_winnow_store(spark, path, shorty) == 0  # remembered
    # and the marker row never pollutes matching
    hits = FP.contamination_against_store(
        spark, path, _docs(spark, [(9, PAD_B + SHARED)]), min_shared=1
    )
    assert {r.eval_id for r in hits.collect()} == {0}


def test_winnow_store_compaction_matches_unchanged(spark, tmp_path):
    import glob

    path = str(tmp_path / "wstore_comp")
    FP.build_winnow_store(_docs(spark, [(0, PAD_A + SHARED)]), path)
    for i in range(1, 4):
        FP.append_to_winnow_store(
            spark, path,
            _docs(spark, [(i, f"{PAD_A}{SHARED} appended variant {i}")]),
        )
    assert len(glob.glob(f"{path}/fps/part-*.parquet")) >= 4
    probe = _docs(spark, [(99, PAD_B + SHARED)])
    before = sorted(
        map(tuple, FP.contamination_against_store(spark, path, probe, min_shared=1).collect())
    )
    n_files = FP.compact_winnow_store(spark, path)
    assert n_files == 1 == len(glob.glob(f"{path}/fps/part-*.parquet"))
    after = sorted(
        map(tuple, FP.contamination_against_store(spark, path, probe, min_shared=1).collect())
    )
    assert before == after and before
