"""Registry for module-level persisted-relation caches.

Several operators persist an expensive shared base relation (the Jaccard
shingle base, the IVF embedding base, the MinHash signature base, the
decontamination gram base). The returned query plans are lazy, so an
in-function unpersist would fire before the driver ever runs the plan;
instead each operator keeps the persisted DataFrame in a module-level
list and releases the PREVIOUS call's relation on the next call, so at
most one cached relation per family outlives its query.

This module centralizes those lists so interactive sessions (and the
bench teardown) can free everything at once with release_all() instead
of relying on the next same-family call or session shutdown.

Notebook lifecycle example (see examples/interactive_session.py for the
runnable version)::

    import data_engineering_spotify_etl_airflow_aws_spark as engine
    from data_engineering_spotify_etl_airflow_aws_spark import caches, registry
    from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark

    engine.load_all_operators()
    spark = get_spark()
    sf = "/root/testdata/sf0.01"

    registry.QUERIES["minhash_lsh_near_dup"](spark, sf).show()   # persists base
    registry.QUERIES["ivf_topk_similar"](spark, sf).show()       # persists base
    # ... exploration done - executor memory back in one call:
    caches.release_all()
    # later queries just rebuild their bases on demand
"""

from __future__ import annotations

_REGISTRY: list[list] = []


def register_cache(cache: list) -> list:
    """Register a module's persist-cache list; returns it for assignment."""
    _REGISTRY.append(cache)
    return cache


def release_all() -> None:
    """Unpersist and drop every cached relation across all operator
    modules. Safe to call at any time; subsequent queries rebuild their
    bases on demand."""
    for cache in _REGISTRY:
        while cache:
            cache.pop().unpersist()
