"""Operator inventory (SURVEY.md §2) as (spark, sf_dir) -> DataFrame callables.

Modules:
- ``scans``         P1-P10  scans / filters / predicates / projections
- ``joins``         J1-J4   stream-table style joins incl. flagship availability
- ``aggregates``    A1-A2   keyed aggregations
- ``mutations``     M1-M6   read-modify-write dataflows in batch oracle form
- ``cdc``           S2/P7   CDC keep-last upsert clone + topic state router
- ``notifications`` S8      notification template rendering (F6/F7)
- ``dedup``         ext     exact / MinHash-LSH / SimHash / n-gram Jaccard /
                             embedding-cosine dedup
- ``similarity``    ext     cosine top-k ANN (brute force + LSH-bucketed)
- ``text``          ext     lang-id, quality scoring, token counts, fingerprint
- ``multimodal``    ext     binary payload + metadata plumbing (decode stubbed)
"""
