"""Arrow schemas + deterministic synthetic page-table generator.

The input contract (BASELINE.json ``input_hint``) is a Parquet table of
Common-Crawl-style pages::

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

All synthetic data is a *pure function of (spec, page index)* — no wall clock,
no global RNG state — so generation is embarrassingly parallel across Ray
blocks and bit-identical at any block split, and the sequential oracle can
re-derive the exact same graph truth (FIXTURES.md §B).

The link topology mixes known-answer subgraphs (FIXTURES.md §B.2):

    [0, R)                      ring        i -> (i+1) % R
    [R]                         star hub    (no out-links => dangling)
    (R, R+H]                    star leaves leaf -> hub
    [R+H+1, R+H+1+K*C)          K cliques   complete digraph within each
    [.., ..+D)                  dangling    in-edge from ring, out-degree 0
    overlay                     per-vertex seeded random extra links (optional)

Duplicate edges + self-loops are injected at a fixed index stride to exercise
dedup (reference analog: overlap-peak dedup, peak_detect_v4.py:1710-1728).
A fixed stride of pages gets malformed HTML (unclosed tags) to exercise the
annotate-don't-crash gates (reference analog: fail_reason columns, SURVEY §2.4).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

EDGES_SCHEMA = pa.schema([pa.field("src", pa.string()), pa.field("dst", pa.string())])
RANKS_SCHEMA = pa.schema([pa.field("vid", pa.int64()), pa.field("score", pa.float64())])
COMPONENTS_SCHEMA = pa.schema([pa.field("vid", pa.int64()), pa.field("comp", pa.int64())])
LABELS_SCHEMA = pa.schema([pa.field("vid", pa.int64()), pa.field("label", pa.int64())])

_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
_N_SITES = 97
_LANGS = ("en", "de", "fr", "xx")

_VOCAB = (
    "crawl web graph link page rank anchor node edge stream shard block "
    "batch arrow vector column table index hash salt skew hub spoke ring "
    "clique dangling mass teleport converge iterate partition shuffle "
    "scatter gather combine checkpoint resume manifest lineage metric"
).split()


@dataclass(frozen=True)
class PageSpec:
    """Parameters of the synthetic corpus. Defaults give ~240 pages."""

    ring: int = 64
    star_leaves: int = 32
    cliques: int = 4
    clique_size: int = 5
    dangling: int = 16
    overlay_avg_links: float = 0.0  # expected extra random out-links per page
    dup_every: int = 10  # every k-th page repeats its first link + self-loop
    malformed_every: int = 13  # every k-th page has broken HTML
    seed: int = 42
    extra_pages: int = 0  # isolated filler pages (no links) to scale volume

    @property
    def hub(self) -> int:
        return self.ring

    @property
    def clique_base(self) -> int:
        return self.ring + 1 + self.star_leaves

    @property
    def dangling_base(self) -> int:
        return self.clique_base + self.cliques * self.clique_size

    @property
    def n_pages(self) -> int:
        return self.dangling_base + self.dangling + self.extra_pages


def url_of(i: int) -> str:
    return f"https://site{i % _N_SITES}.example/p/{i}"


def _page_rng(spec: PageSpec, i: int, tag: str) -> np.random.Generator:
    h = hashlib.blake2b(f"{spec.seed}:{tag}:{i}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "little"))


def out_links(spec: PageSpec, i: int) -> list[int]:
    """Destination page indices of page ``i`` — pure, duplicates included."""
    links: list[int] = []
    if i < spec.ring:
        links.append((i + 1) % spec.ring)
        # the first D ring vertices each feed one dangling-tail vertex
        if spec.dangling and i < spec.dangling:
            links.append(spec.dangling_base + i)
    elif i == spec.hub:
        pass  # hub has no out-links (dangling hub)
    elif i <= spec.ring + spec.star_leaves:
        links.append(spec.hub)
    elif i < spec.dangling_base:
        k = (i - spec.clique_base) // spec.clique_size
        base = spec.clique_base + k * spec.clique_size
        links.extend(j for j in range(base, base + spec.clique_size) if j != i)
    # dangling tail and extra pages: no structural out-links
    in_dangling_tail = spec.dangling_base <= i < spec.dangling_base + spec.dangling
    if spec.overlay_avg_links > 0 and not in_dangling_tail:
        rng = _page_rng(spec, i, "ov")
        n_extra = rng.poisson(spec.overlay_avg_links)
        if n_extra:
            links.extend(int(v) for v in rng.integers(0, spec.n_pages, size=n_extra))
    if spec.dup_every and i % spec.dup_every == 0:
        if links:
            links.append(links[0])  # duplicate edge
        links.append(i)  # self-loop
    return links


def body_words(spec: PageSpec, i: int) -> str:
    rng = _page_rng(spec, i, "txt")
    n = int(rng.integers(20, 60))
    idx = rng.integers(0, len(_VOCAB), size=n)
    return " ".join(_VOCAB[j] for j in idx)


def render_page(spec: PageSpec, i: int) -> bytes:
    """Deterministic HTML for page ``i`` embedding its out-links as anchors."""
    anchors = "\n".join(
        f'<li><a href="{url_of(d)}">link {j}</a></li>' for j, d in enumerate(out_links(spec, i))
    )
    malformed = spec.malformed_every and i % spec.malformed_every == 0 and i > 0
    body_close = "<div><b>unclosed" if malformed else "</body></html>"
    html = (
        f"<html><head><title>Page {i} &mdash; site{i % _N_SITES}</title></head>\n"
        f"<body>\n<h1>Page {i}</h1>\n"
        f"<p>{body_words(spec, i)}</p>\n"
        f"<ul>\n{anchors}\n</ul>\n"
        f"{body_close}"
    )
    return html.encode("utf-8")


def pages_batch(spec: PageSpec, lo: int, hi: int) -> pa.Table:
    """Pages [lo, hi) as an Arrow table — the unit of parallel generation."""
    idx = range(lo, min(hi, spec.n_pages))
    return pa.table(
        {
            "url": pa.array([url_of(i) for i in idx], pa.string()),
            "warc_ts": pa.array(
                [_EPOCH_US + i * 1_000_000 for i in idx], pa.timestamp("us")
            ),
            "html": pa.array([render_page(spec, i) for i in idx], pa.binary()),
            "text": pa.array([None] * len(idx), pa.string()),
            "lang": pa.array([_LANGS[i % len(_LANGS)] for i in idx], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def pages_table(spec: PageSpec) -> pa.Table:
    """Whole corpus in one Arrow table (test scale only)."""
    return pages_batch(spec, 0, spec.n_pages)


_EST_PAGE_BYTES = 1600


class SyntheticPagesDatasource:
    """Custom Ray Data datasource for the synthetic corpus (SURVEY §2.1:
    the reference's binary readers map to custom datasources).

    One ReadTask per index range — the scheduler sees the true output size
    (a range row expands to thousands of pages, so a plain from_items +
    map_batches would be bundled into far too few tasks)."""

    def __init__(self, spec: PageSpec):
        self.spec = spec

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        spec = self.spec
        n = spec.n_pages
        step = max(1, -(-n // max(1, parallelism)))
        tasks = []
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            meta = BlockMetadata(
                num_rows=hi - lo, size_bytes=(hi - lo) * _EST_PAGE_BYTES,
                exec_stats=None, input_files=None,
            )
            tasks.append(ReadTask(
                lambda lo=lo, hi=hi: [pages_batch(spec, lo, hi)], meta
            ))
        return tasks

    def estimate_inmemory_data_size(self):
        return self.spec.n_pages * _EST_PAGE_BYTES

    def get_name(self) -> str:
        return "SyntheticPages"


def pages_dataset(spec: PageSpec, *, parallelism: int = 16):
    """Corpus as a Ray Dataset, generated in parallel read tasks.

    Bit-identical to :func:`pages_table` at any ``parallelism`` because each
    page depends only on (spec, index).
    """
    import ray.data as rd
    from ray.data.datasource import Datasource

    class _DS(SyntheticPagesDatasource, Datasource):
        pass

    return rd.read_datasource(_DS(spec), override_num_blocks=parallelism)


def true_edges(spec: PageSpec) -> list[tuple[str, str]]:
    """Ground-truth (src_url, dst_url) edge list, duplicates included."""
    return [
        (url_of(i), url_of(d)) for i in range(spec.n_pages) for d in out_links(spec, i)
    ]
