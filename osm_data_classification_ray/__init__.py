"""osm_data_classification_ray — a Ray-Data-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of
``geoslegend/osm-data-classification`` (per-entity feature aggregation +
PCA/KMeans classification; see SURVEY.md §1) over Common-Crawl-style web
pages, built Ray-Data-first:

- one ``ray.data.Dataset`` per logical table, Arrow blocks throughout
- stateless transforms as ``map_batches(fn, batch_format="pyarrow")``
- stateful stages (polygon index, PCA/KMeans models) as actor pools
- wide steps as ``groupby``/``aggregate``/``map_groups`` with explicit
  partitioning keys and skew salting (SURVEY.md §5.3)

The reference checkout at /root/reference is empty (SURVEY.md §0), so the
binding spec is BASELINE.json's north_rule plus the SURVEY.md / FIXTURES.md
reconstruction; goldens are self-defined deterministic fixtures.

NOTE: nothing in this package calls ``ray.init()`` — the driver / bench.py /
test fixtures own the Ray session.
"""

__version__ = "0.1.0"
