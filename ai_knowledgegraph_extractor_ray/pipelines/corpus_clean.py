"""Composed training-data cleaning pipeline: the corpus operators chained
the way a pretraining-data job would run them, as ONE streaming Dataset
pipeline with the cheap filters first.

    raw documents
      -> validate_texts        (drop empty / oversized — vectorized filter)
      -> exact_dedup           (uniform content-hash shuffle)
      -> near_dedup_minhash    (LSH blocking; broadcast drop list)
      -> quality_score filter  (Gopher-style threshold)
      -> lang allowlist filter (marker-vocabulary language ID)
      -> surviving documents + a per-stage row-count report

Stage order is the cost ladder: each stage only pays for rows the cheaper
stages kept. Counting is done with per-block partials folded into the
stage transforms (no extra passes over the data beyond the stages
themselves — each ``count()`` consumes the stage's lazy prefix once, and
stages downstream reuse the already-deduped dataset).
"""

from __future__ import annotations

import ray.data as rd

from ..ops import dedup, text


def clean_corpus(
    docs: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id",
    near_threshold: float = 0.8, min_quality: float = 0.3,
    allowed_langs: tuple[str, ...] = ("en", "fr", "es", "de", "zh"),
    cluster_mode: str = "driver", report: bool = True,
) -> tuple[rd.Dataset, dict]:
    """Returns (cleaned Dataset, per-stage report of surviving row counts).

    ``report=False`` skips the per-stage counting passes and their
    stage-boundary materializations (each count is a full extra execution
    of its lazy prefix — roughly half the pipeline's dataset executions at
    small scale); only the materialize the near-dedup pass genuinely needs
    (its input is scanned twice) remains."""
    stats: dict[str, int] = {}
    if report:
        stats["input"] = docs.count()

    ds = text.validate_texts(docs, text_col=text_col)
    if report:
        # materialize before counting: the count() would otherwise execute
        # the validate stage once and exact_dedup would re-execute it
        ds = ds.materialize()
        stats["after_validate"] = ds.count()

    # always materialized: near-dedup scans its input twice (slim band pass
    # + hot-bucket text pass)
    ds = dedup.exact_dedup(ds, text_col=text_col, id_col=id_col).materialize()
    if report:
        stats["after_exact_dedup"] = ds.count()

    ds = dedup.near_dedup_minhash(ds, text_col=text_col, id_col=id_col,
                                  threshold=near_threshold,
                                  cluster_mode=cluster_mode)
    if report:
        ds = ds.materialize()
        stats["after_near_dedup"] = ds.count()

    import pyarrow as pa
    import pyarrow.compute as pc

    ds = text.lang_id(text.quality_score(ds, text_col=text_col),
                      text_col=text_col)
    lang_set = pa.array(list(allowed_langs), pa.string())

    def keep(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(t["quality"], min_quality),
            pc.is_in(t["lang_guess"], value_set=lang_set))
        return t.filter(ok)

    ds = ds.map_batches(keep, batch_format="pyarrow")
    if report:
        ds = ds.materialize()
        stats["after_quality_lang"] = ds.count()

    return ds, stats
