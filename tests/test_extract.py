"""Extraction stage: byte-identical text vs the sequential oracle, gate
columns, edge explosion vs ground truth. (SURVEY §5 / BASELINE per-row
invariant.)"""

import pyarrow as pa
import pytest

from raylink import extract, oracle, tables


SPEC = tables.PageSpec(ring=16, star_leaves=8, cliques=2, clique_size=4,
                       dangling=4, dup_every=7, malformed_every=5)


def test_generator_deterministic_and_parallel_equal():
    t1 = tables.pages_table(SPEC)
    t2 = tables.pages_table(SPEC)
    assert t1.equals(t2)
    ds = tables.pages_dataset(SPEC, parallelism=5)
    t3 = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).sort_by("url")
    assert t3.num_rows == t1.num_rows
    t1s = t1.sort_by("url")
    assert t1s["html"].to_pylist() == t3["html"].to_pylist()


def test_extract_one_pure_and_parse_gate():
    t = tables.pages_table(SPEC)
    # page 5 is malformed (malformed_every=5), page 1 is fine
    i_bad = 5
    _, _, ok_bad, _ = extract.extract_one(t["html"][i_bad].as_py())
    _, _, ok_good, _ = extract.extract_one(t["html"][1].as_py())
    assert not ok_bad and ok_good


def test_ray_extraction_byte_identical_to_oracle():
    truth = oracle.extract_pages(SPEC)
    pages = tables.pages_dataset(SPEC, parallelism=4)
    docs = extract.pages_to_docs(pages, batch_size=16, concurrency=2)
    seen = {}
    for b in docs.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            seen[b["url"][i].as_py()] = (
                b["text"][i].as_py(),
                b["links"][i].as_py(),
                b["parse_ok"][i].as_py(),
            )
    assert set(seen) == set(truth)
    for url, (text, links, ok) in truth.items():
        r_text, r_links, r_ok = seen[url]
        assert r_text == text, f"text mismatch for {url}"
        assert r_links == links
        assert r_ok == ok


def test_edges_match_ground_truth():
    truth_edges = tables.true_edges(SPEC)  # with duplicates
    pages = tables.pages_dataset(SPEC, parallelism=4)
    docs = extract.pages_to_docs(pages, batch_size=16, concurrency=2)
    edges = extract.docs_to_edges(docs)
    got = sorted(
        (b["src"][i].as_py(), b["dst"][i].as_py())
        for b in edges.iter_batches(batch_format="pyarrow")
        for i in range(b.num_rows)
    )
    assert got == sorted(truth_edges)


def test_extract_garbage_bytes_annotates_not_crashes():
    # annotate-don't-crash gate on non-HTML binary payloads
    text, links, ok, n = extract.extract_one(b"\x00\xff\xfe garbage \x80")
    assert not ok and links == [] and isinstance(text, str)


def test_csv_source_roundtrip(tmp_path):
    """SURVEY §2.1 CSV reader family: rd.read_csv feeds the same ops."""
    import ray.data as rd
    import duckdb

    path = str(tmp_path / "ev.csv")
    duckdb.connect().sql(
        "COPY (SELECT event_id, user_id, event_type FROM "
        "'/root/testdata/sf0.001/events.parquet' LIMIT 200) TO "
        f"'{path}' (HEADER, DELIMITER ',')"
    )
    from raylink.ops import grouped_mode

    ds = rd.read_csv(path)
    out = grouped_mode(ds, "user_id", "event_type", "mode_type").to_pandas()
    assert len(out) > 0 and out["mode_type"].notna().all()


def test_normalize_url():
    n = extract.normalize_url
    assert n("HTTPS://Example.COM/a#frag") == "https://example.com/a"
    assert n("http://x.org") == "http://x.org/"
    assert n("/rel", base="https://h.example/p/1") == "https://h.example/rel"
    assert n("mailto:a@b.c") is None
    assert n("javascript:void(0)") is None
    assert n("ftp://x.org/f") is None
