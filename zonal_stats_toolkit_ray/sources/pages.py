"""The ``pages`` corpus: Common-Crawl-style web pages, exactly the
``BASELINE.json input_hint`` schema:

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Two constructors:

* :func:`read_pages` — derives pages from a driver-provided
  ``documents.parquet`` table (``/root/testdata/sf*/``) with a fully
  vectorized Arrow ``map_batches`` (no Python row loop); ``text`` bytes are
  carried through unchanged, which is the per-row invariant the engine
  must preserve end-to-end (byte-identical text per url).
* :func:`synth_pages_table` — small seeded in-memory table for unit tests,
  with a configurable verbatim-duplicate fraction to exercise exact dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_2024 = 1704067200_000000  # 2024-01-01T00:00:00 in microseconds


def docs_batch_to_pages(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, source, n_chars) → pages, vectorized.

    url is a pure function of (source, doc_id) so geocoding and joins are
    reproducible; html wraps the text bytes; warc_ts is a deterministic
    ramp from 2024-01-01 stepped by doc_id.  ``text`` passes through
    zero-copy (same Arrow buffer).
    """
    doc_id = batch["doc_id"]
    text = batch["text"]
    doc_id_str = pc.cast(doc_id, pa.string())
    url = pc.binary_join_element_wise(
        "https://", batch["source"], ".example/doc/", doc_id_str, ""
    )
    html = pc.binary_join_element_wise(
        pa.scalar(b"<html><body>", pa.binary()),
        pc.cast(text, pa.binary()),
        pa.scalar(b"</body></html>", pa.binary()),
        pa.scalar(b"", pa.binary()),
    )
    ts = pc.cast(
        pc.add(pc.multiply(pc.cast(doc_id, pa.int64()), 1_000_000), _EPOCH_2024),
        pa.timestamp("us"),
    )
    return pa.table(
        {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": batch["lang"]},
        schema=PAGES_SCHEMA,
    )


def read_pages(sf_dir: str, *, parallelism: int | None = None):
    """Ray Dataset of pages derived from ``{sf_dir}/documents.parquet``."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    return ds.map_batches(docs_batch_to_pages, batch_format="pyarrow")


_WORDS = (
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore "
    "et dolore magna aliqua enim ad minim veniam quis nostrud exercitation"
).split()


def synth_pages_table(n: int, seed: int = 42, dup_fraction: float = 0.1) -> pa.Table:
    """Seeded in-memory pages table (FIXTURES.md §1) for unit tests."""
    rng = np.random.default_rng(seed)
    langs = rng.choice(
        np.array(["en", "de", "fr", "es", "zh"]),
        size=n,
        p=[0.5, 0.15, 0.15, 0.1, 0.1],
    )
    urls, texts = [], []
    for i in range(n):
        host = f"site{int(rng.integers(0, max(2, n // 10)))}"
        urls.append(f"https://{host}.example/p/{i}")
        k = int(rng.integers(3, 60))
        texts.append(" ".join(rng.choice(_WORDS, size=k).tolist()))
    # duplicate a fraction verbatim (same url ⇒ same text)
    n_dup = int(n * dup_fraction)
    for j in range(n_dup):
        src = int(rng.integers(0, n))
        urls.append(urls[src])
        texts.append(texts[src])
        langs = np.append(langs, langs[src])
    total = n + n_dup
    ts = pa.array(
        (_EPOCH_2024 + np.arange(total, dtype=np.int64) * 1_000_000),
        pa.timestamp("us"),
    )
    html = [b"<html><body>" + t.encode() + b"</body></html>" for t in texts]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
