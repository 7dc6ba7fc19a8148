"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship documents→tiles pipeline at sf0.001 scale;
``queries()`` exposes every implemented operator (SURVEY.md §2) as a
callable over an sf dir; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for the SQL-expressible subset (geospatial queries recompute tile math /
bboxes / haversine from the synth ground-truth vertex table, which is
written from pre-WKB coordinates and therefore independent of the engine's
codecs).

Ray is initialised by the driver before import; nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on the sf0.001-scale synthetic corpus."""
    from grandine_ray.pipelines import tiler
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf("/root/testdata/sf0.001")
    docs = tiler.read_documents(f"{corpus}/documents.parquet")
    return tiler.tile_dataset(docs, zooms=list(range(0, 7)))


def queries() -> dict[str, Callable[[str], Any]]:
    from grandine_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from grandine_ray.pipelines.queries import ORACLE_SQL
    from grandine_ray.sources import synth

    # the geospatial oracle SQL reads the synthetic ground-truth parquet at
    # a fixed path; make sure it exists even if DuckDB runs before the
    # corresponding Ray query callable (generation is deterministic+cached)
    corpus = synth.ensure_corpus(10_000)
    # independent precomputed ground truth for the non-SQL-expressible
    # queries (scalar from-scratch reimplementations, oracle/expected.py)
    from grandine_ray.oracle.expected import ensure_expected

    ensure_expected(corpus)
    return dict(ORACLE_SQL)
