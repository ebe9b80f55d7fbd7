"""Round-12 pins: single-Python-stage media paths and the sortless
cutoff shapes for the last two unpartitioned-window queries.

- multimodal_wav_frame_rms / multimodal_bmp_ppm_decode /
  multimodal_image_patch_pool (multimodal.py): encode+parse+reduce now
  run in ONE mapInPandas (the round-11 AVI treatment) — the plan must
  contain exactly one Python stage, and the batch-vectorized WAV math
  must equal the per-doc frame_energy_stats formulation bit-for-bit.
- part_revenue_abc_classes / revenue_pareto_coverage (mining.py) and
  quality_decile_token_budget (text4.py): the ``use_cutoff_*`` flags
  switch to broadcast boundary-key shapes
  (functions.weighted_order_boundary_rows / order_boundary_rows) —
  bit-identical to the window defaults, with no global sort anywhere
  in the flagged plan (the RFM pattern; the window stays default
  because the measured construction-inclusive sf1 crossover favors one
  sorted pass of the reduced table at benchmark scale).
"""

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def _python_stage_count(df) -> int:
    # count executed-plan Python stages; mapInPandas shows as
    # MapInPandas (FlatMapGroupsInPandas/ArrowEvalPython would indicate
    # a different — unexpected — Python operator)
    plan = _final_plan(df)
    return plan.count("MapInPandas")


# --- single-Python-stage media paths ----------------------------------------


def test_wav_frame_rms_single_python_stage(spark, sf_dir):
    from beametrics_spark.operators.multimodal import multimodal_wav_frame_rms

    df = multimodal_wav_frame_rms(spark, sf_dir)
    df.collect()
    assert _python_stage_count(df) == 1, _final_plan(df)


def test_bmp_ppm_decode_single_python_stage(spark, sf_dir):
    from beametrics_spark.operators.multimodal import (
        multimodal_bmp_ppm_decode,
    )

    df = multimodal_bmp_ppm_decode(spark, sf_dir)
    df.collect()
    assert _python_stage_count(df) == 1, _final_plan(df)


def test_image_patch_pool_single_python_stage(spark, sf_dir):
    from beametrics_spark.operators.multimodal import (
        multimodal_image_patch_pool,
    )

    df = multimodal_image_patch_pool(spark, sf_dir)
    df.collect()
    assert _python_stage_count(df) == 1, _final_plan(df)


def test_wav_vectorized_matches_per_doc_stats(spark, sf_dir):
    """The fused batch math (cumsum + reduceat over concatenated
    samples) must equal the audited per-doc frame_energy_stats path —
    including the monotone int-before-divide max-frame-RMS rewrite."""
    from beametrics_spark.operators.audiocodec import (
        decode_wav,
        fixture_wav_payload,
        frame_energy_stats,
    )
    from beametrics_spark.operators.multimodal import (
        multimodal_wav_frame_rms,
    )

    got = {
        r["doc_id"]: r
        for r in multimodal_wav_frame_rms(spark, sf_dir).collect()
    }
    assert len(got) > 0
    for doc_id in list(got)[:25]:
        n, nf, rms, peak, mfr = frame_energy_stats(
            decode_wav(fixture_wav_payload(int(doc_id)))
        )
        r = got[doc_id]
        assert (r["n_samples"], r["n_frames"], r["peak"]) == (n, nf, peak)
        assert r["rms_global"] == round(rms, 6)
        assert r["max_frame_rms"] == round(mfr, 6)


def test_bmp_ppm_decode_matches_two_stage_path(spark, sf_dir):
    """The fused decode must equal the stored-media shape
    (bmp_ppm_media_table → decode_media) it replaced in the registry."""
    from beametrics_spark.operators.multimodal import (
        bmp_ppm_media_table,
        decode_media,
        multimodal_bmp_ppm_decode,
    )

    got = sorted(
        map(tuple, multimodal_bmp_ppm_decode(spark, sf_dir).collect())
    )
    media = bmp_ppm_media_table(spark, sf_dir)
    decoded = decode_media(media, fake=False)
    mr = F.element_at("feature", 1)
    mg = F.element_at("feature", 2)
    mb = F.element_at("feature", 3)
    want = sorted(
        map(
            tuple,
            decoded.select(
                "doc_id",
                "media_type",
                "width",
                "height",
                mr.alias("mean_r"),
                mg.alias("mean_g"),
                mb.alias("mean_b"),
                F.round(F.sqrt(mr * mr + mg * mg + mb * mb), 6).alias(
                    "feature_norm"
                ),
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


# --- sortless cutoff shapes ---------------------------------------------------


def test_abc_cutoff_path_matches_cumulative_window(spark, sf_dir):
    from beametrics_spark.operators.mining import part_revenue_abc_classes

    got = sorted(
        map(
            tuple,
            part_revenue_abc_classes(
                spark, sf_dir, use_cutoff_classes=True
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, part_revenue_abc_classes(spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0


def test_abc_cutoff_plan_has_no_global_sort(spark, sf_dir):
    """No single-task global sort anywhere in the flagged plan: no
    rangepartitioning exchange, and every window runs over the tiny
    _bin partitions / bin-count table (same pin pattern as
    test_functions.py::test_cutoff_path_has_no_global_sort)."""
    from beametrics_spark.operators.mining import part_revenue_abc_classes

    df = part_revenue_abc_classes(spark, sf_dir, use_cutoff_classes=True)
    df.collect()
    plan = _final_plan(df)
    assert "rangepartitioning" not in plan.lower().replace(" ", ""), plan
    _assert_windows_only_over_bin_tables(plan)


def test_pareto_coverage_cutoff_matches_window(spark, sf_dir):
    from beametrics_spark.operators.mining import revenue_pareto_coverage

    got = sorted(
        map(
            tuple,
            revenue_pareto_coverage(
                spark, sf_dir, use_cutoff_coverage=True
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, revenue_pareto_coverage(spark, sf_dir).collect())
    )
    assert got == want and len(got) == 4


def test_pareto_coverage_cutoff_plan_has_no_global_sort(spark, sf_dir):
    from beametrics_spark.operators.mining import revenue_pareto_coverage

    df = revenue_pareto_coverage(spark, sf_dir, use_cutoff_coverage=True)
    df.collect()
    plan = _final_plan(df)
    assert "rangepartitioning" not in plan.lower().replace(" ", ""), plan
    # the <=5-row tile-table cumulative window is the one allowed
    # non-bin window: its aggregate input columns are the tile partials
    for line in plan.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        spec = line.split("windowspecdefinition(", 1)[1]
        ok = (
            spec.split(",")[0].strip().startswith("_bin")
            or "(_cnt" in line
            or "(_wsum" in line
            or spec.split(",")[0].strip().startswith("tile")
        )
        assert ok, line


def _assert_windows_only_over_bin_tables(plan: str) -> None:
    """Every window in a cutoff-shaped plan must run either partitioned
    by the straddle-bin key (_bin) or over the ≤|bins|-row cumulative
    bin table (its _cnt/_wsum aggregates) — never over a base or
    reduced full-cardinality table."""
    for line in plan.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        spec = line.split("windowspecdefinition(", 1)[1]
        bin_partitioned = spec.split(",")[0].strip().startswith("_bin")
        tiny_table = "(_cnt" in line or "(_wsum" in line
        assert bin_partitioned or tiny_table, line


def test_quality_decile_cutoff_matches_ntile(spark, sf_dir):
    from beametrics_spark.operators.text4 import quality_decile_token_budget

    got = sorted(
        map(
            tuple,
            quality_decile_token_budget(
                spark, sf_dir, use_cutoff_deciles=True
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, quality_decile_token_budget(spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0


def test_quality_decile_cutoff_plan_has_no_global_sort(spark, sf_dir):
    from beametrics_spark.operators.text4 import quality_decile_token_budget

    df = quality_decile_token_budget(spark, sf_dir, use_cutoff_deciles=True)
    df.collect()
    plan = _final_plan(df)
    assert "rangepartitioning" not in plan.lower().replace(" ", ""), plan
    _assert_windows_only_over_bin_tables(plan)


def test_weighted_boundary_rows_tiny_exact(spark):
    """Hand-checkable case: weights 5,3,1,1 in key order, total 10.
    Prefix shares: 0, .5, .8, .9. frac .80 → boundary = last key with
    share < .8 = key 2 (share .5); frac .95 → key 4 (share .9)."""
    from beametrics_spark.functions import weighted_order_boundary_rows

    df = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 1), (4, 1)], "k long, w long"
    )
    row = weighted_order_boundary_rows(
        df, [F.col("k")], F.col("w"), [(1, 0.80), (2, 0.95)]
    ).collect()[0]
    assert row["_tot"] == 10
    bnds = {b["_label"]: b["_key"]["k0"] for b in row["_bnds"]}
    assert bnds == {1: 2, 2: 4}
