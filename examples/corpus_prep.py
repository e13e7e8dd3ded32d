"""An LLM pretraining-corpus preparation run, end to end, as one
spark-submit-able script - the extension-operator families composed the
way a data-curation pipeline actually chains them:

  dedup    -> exact content dedup (md5 groupBy survivors), then
              near-dup candidate stats (SimHash fingerprints)
  filter   -> text quality stats (token/stopword/uniqueness gates)
  analyze  -> language-ID distribution + length-bucket batching plan
              (padding-waste accounting for the dataloader)
  split    -> deterministic train/val/test hash split with the
              content-leakage audit
  pack     -> token-sequence packing into fixed-length training rows
  audit    -> cross-source contamination matrix (worst pair by shingle
              Jaccard)
  index    -> PQ codes for the retrieval index + the measured recall
              cost of searching on codes alone (ADC eval)

Every stage is the registered, oracle-verified operator - this script
just wires them over one SparkSession and prints a run report. At
100 TB each stage is a bounded number of shuffles (see each operator's
docstring); nothing here collects a corpus-sized result to the driver.

Run: `python examples/corpus_prep.py [sf_dir]` (default
/root/testdata/sf0.01), or import and call main(spark, sf_dir) with an
existing session (the test does).
"""

from __future__ import annotations

import sys
from pathlib import Path


def main(spark, sf_dir: str = "/root/testdata/sf0.01") -> dict:
    import data_engineering_spotify_etl_airflow_aws_spark as engine
    from pyspark.sql import functions as F
    from data_engineering_spotify_etl_airflow_aws_spark.operators.curation import (
        hash_split_assignment,
        length_bucket_batching,
        pack_token_sequences,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.operators.dedup import (
        dedup_exact_content,
        simhash_fingerprints,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.operators.text import (
        lang_id_stopword,
        text_quality_stats,
    )

    engine.load_all_operators()

    report: dict = {}

    # 1. exact dedup: survivors per content group (count only - the
    #    downstream stages would re-join survivors against documents)
    survivors = dedup_exact_content(spark, sf_dir)
    report["exact_survivors"] = survivors.count()

    # 2. near-dup fingerprints: how many distinct SimHash buckets the
    #    corpus occupies (collision candidates share a fingerprint)
    sims = simhash_fingerprints(spark, sf_dir)
    report["simhash_fingerprints"] = sims.select("simhash32").distinct().count()

    # 3. quality gate: docs passing a minimal quality score
    quality = text_quality_stats(spark, sf_dir)
    report["quality_pass"] = quality.where("quality_score >= 0.5").count()
    report["quality_total"] = quality.count()

    # 4. language mix + batching plan
    report["languages"] = lang_id_stopword(spark, sf_dir).count()
    buckets = length_bucket_batching(spark, sf_dir).collect()
    report["padding_waste_tokens"] = sum(r["padding_waste"] for r in buckets)

    # 5. leak-audited split
    split = {r["split"]: r for r in hash_split_assignment(spark, sf_dir).collect()}
    report["split_docs"] = {k: v["n_docs"] for k, v in split.items()}
    report["leaked_contents"] = next(iter(split.values()))["n_leaked_contents"]

    # 6. packing plan: training rows after packing to fixed-length
    #    sequences
    report["packed_rows"] = pack_token_sequences(spark, sf_dir).count()

    # 7. cross-source contamination audit: the worst source pair by
    #    shared-shingle Jaccard (is the crawl re-ingesting itself?)
    from data_engineering_spotify_etl_airflow_aws_spark.operators.filtering import (
        cross_source_ngram_overlap,
    )

    worst = (
        cross_source_ngram_overlap(spark, sf_dir)
        .orderBy(F.desc("jaccard"), "source_a", "source_b")
        .first()
    )
    report["worst_source_overlap"] = (
        f"{worst['source_a']}x{worst['source_b']} j={worst['jaccard']:.4f}"
        if worst
        else None
    )

    # 8. embedding compression plan: PQ codes for the retrieval index
    #    plus the measured recall cost of searching on codes alone
    from data_engineering_spotify_etl_airflow_aws_spark.operators.similarity import (
        pq_adc_recall_eval,
        pq_encode_embeddings,
    )

    report["pq_encoded_vecs"] = pq_encode_embeddings(spark, sf_dir).count()
    report["pq_adc_avg_recall"] = round(
        pq_adc_recall_eval(spark, sf_dir)
        .agg(F.avg("recall_at_k").alias("r"))
        .first()["r"],
        4,
    )

    return report


if __name__ == "__main__":
    # running as `python examples/<script>.py` puts examples/ (not the
    # repo root) on sys.path - add the root so the package resolves
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-prep")
    out = main(spark, sf_dir)
    for k, v in out.items():
        print(f"{k}: {v}")
