"""Deterministic synthetic Common-Crawl-style web pages.

The engine's primary input table, exactly the shape of BASELINE.json's
``input_hint``: ``(url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string)``.

Every row is a pure function of (SEED, row index) via a counter-based
splitmix64 hash, so generation is order- and partition-independent:
``ray.data.range(n).map_batches(page_batch)`` produces identical rows
no matter how Ray blocks the range. This mirrors the reference's
deterministic fixture strategy (tilemaker CI pins test/monaco.pbf and a
checksummed Liechtenstein extract, /root/reference/.github/workflows/ci.yml:243-263).

Geo-signal design (FIXTURES.md §1):
- city draw is zipf-distributed over a fixed city list so a few urban
  cells/tiles are HOT — exercising salted repartitioning;
- a fixed fraction of pages carry no geo signal (extractor emits 0
  features) and a fixed fraction carry several (flat-map 1→N);
- machine-readable signals live in <head> (<meta name="geo.position">,
  geo.track, geo.footprint); one human-readable "at lat, lon" mention
  is embedded in the visible text;
- the ``text`` column is byte-identical to what
  :func:`tilemaker_ray.stages.extract.extract_text` recovers from
  ``html`` (the per-row invariant verified by pytest).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

SEED = 42

# (name, lon, lat) — fixed city list; zipf rank = list order
CITIES = [
    ("tokyo", 139.6917, 35.6895), ("delhi", 77.1025, 28.7041),
    ("shanghai", 121.4737, 31.2304), ("saopaulo", -46.6333, -23.5505),
    ("mexicocity", -99.1332, 19.4326), ("cairo", 31.2357, 30.0444),
    ("mumbai", 72.8777, 19.0760), ("beijing", 116.4074, 39.9042),
    ("dhaka", 90.4125, 23.8103), ("osaka", 135.5023, 34.6937),
    ("newyork", -74.0060, 40.7128), ("karachi", 67.0011, 24.8607),
    ("buenosaires", -58.3816, -34.6037), ("chongqing", 106.9123, 29.4316),
    ("istanbul", 28.9784, 41.0082), ("kolkata", 88.3639, 22.5726),
    ("manila", 120.9842, 14.5995), ("lagos", 3.3792, 6.5244),
    ("riodejaneiro", -43.1729, -22.9068), ("tianjin", 117.3616, 39.3434),
    ("kinshasa", 15.2663, -4.4419), ("guangzhou", 113.2644, 23.1291),
    ("losangeles", -118.2437, 34.0522), ("moscow", 37.6173, 55.7558),
    ("shenzhen", 114.0579, 22.5431), ("lahore", 74.3587, 31.5204),
    ("bangalore", 77.5946, 12.9716), ("paris", 2.3522, 48.8566),
    ("bogota", -74.0721, 4.7110), ("jakarta", 106.8456, -6.2088),
    ("chennai", 80.2707, 13.0827), ("lima", -77.0428, -12.0464),
    ("bangkok", 100.5018, 13.7563), ("seoul", 126.9780, 37.5665),
    ("nagoya", 136.9066, 35.1815), ("hyderabad", 78.4867, 17.3850),
    ("london", -0.1276, 51.5074), ("tehran", 51.3890, 35.6892),
    ("chicago", -87.6298, 41.8781), ("chengdu", 104.0665, 30.5723),
    ("berlin", 13.4050, 52.5200), ("madrid", -3.7038, 40.4168),
    ("singapore", 103.8198, 1.3521), ("sydney", 151.2093, -33.8688),
    ("auckland", 174.7633, -36.8485), ("anchorage", -149.9003, 61.2181),
    ("reykjavik", -21.9426, 64.1466), ("ushuaia", -68.3030, -54.8019),
    ("suva", 178.4419, -18.1416), ("apia", -171.7513, -13.8506),
]
_CITY_LON = np.array([c[1] for c in CITIES])
_CITY_LAT = np.array([c[2] for c in CITIES])
_CITY_NAMES = [c[0] for c in CITIES]

_TLDS = ["com", "org", "net", "io", "de", "fr", "jp", "br"]
_LANGS = ["en", "de", "fr", "es", "pt", "ja", "zh", "ru", "ar", "hi"]
_ZIPF_S = 1.2

_WORDS = ("travel guide city map review hotel food street museum park "
          "river station market tower bridge garden harbor festival "
          "weather history district tour photo").split()

_EPOCH_2025_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00 in epoch micros


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        x = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _u01(idx: np.ndarray, stream: int) -> np.ndarray:
    """Uniform(0,1) per row, independent per ``stream``."""
    h = _splitmix64(np.asarray(idx, dtype=np.uint64)
                    ^ _splitmix64(np.uint64(SEED * 1000 + stream)))
    return (h >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)


def _zipf_idx(u: np.ndarray, n: int, s: float = _ZIPF_S) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    cdf = np.cumsum(w) / w.sum()
    return np.searchsorted(cdf, u, side="right").clip(0, n - 1)


def _jitter(idx, stream, scale):
    """Gaussian jitter via Box–Muller from two deterministic uniforms."""
    u1 = np.clip(_u01(idx, stream), 1e-12, 1.0)
    u2 = _u01(idx, stream + 1)
    return scale * np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def page_batch(batch: dict) -> pa.Table:
    """Vectorized generator: a block of ``range(n)`` ids → pages rows."""
    idx = np.asarray(batch["id"], dtype=np.uint64)
    n = len(idx)
    city = _zipf_idx(_u01(idx, 1), len(CITIES))
    lang = np.asarray(_LANGS)[_zipf_idx(_u01(idx, 2), len(_LANGS))]
    tld = np.asarray(_TLDS)[(_splitmix64(idx ^ np.uint64(7)) % np.uint64(len(_TLDS))).astype(np.int64)]

    # signal multiplicity: 25% none, 50% one, 25% 2..4
    u = _u01(idx, 3)
    n_sig = np.where(u < 0.25, 0, np.where(u < 0.75, 1, 2 + (u * 97).astype(np.int64) % 3))
    # feature kind of the page's primary signal: 80% point, 12% track, 8% footprint
    uk = _u01(idx, 4)
    kind = np.where(uk < 0.80, 0, np.where(uk < 0.92, 1, 2))
    kind = np.where(n_sig == 0, -1, kind)

    lat0 = _CITY_LAT[city] + _jitter(idx, 10, 0.05)
    lon0 = _CITY_LON[city] + _jitter(idx, 12, 0.05)
    lat0 = np.clip(lat0, -85.0, 85.0)
    # wrap antimeridian overflow
    lon0 = ((lon0 + 180.0) % 360.0) - 180.0

    ts = _EPOCH_2025_US + (idx.astype(np.int64) * 37_000_000 +
                           (_splitmix64(idx ^ np.uint64(13)) % np.uint64(1_000_000)).astype(np.int64))

    wsel = (_splitmix64(idx[:, None] ^ np.uint64(17)
                        ^ (np.arange(8, dtype=np.uint64) * np.uint64(2654435761))[None, :])
            % np.uint64(len(_WORDS))).astype(np.int64)

    urls, htmls, texts = [], [], []
    for i in range(n):
        cname = _CITY_NAMES[city[i]]
        url = f"https://example.{tld[i]}/{cname}/{int(idx[i])}"
        words = " ".join(_WORDS[w] for w in wsel[i])
        paras = [f"{cname.title()} {words}."]
        head_meta = []
        if n_sig[i] > 0:
            paras.append(f"Located at {lat0[i]:.4f}, {lon0[i]:.4f} in {cname.title()}.")
            if kind[i] == 0:
                head_meta.append(
                    f'<meta name="geo.position" content="{lat0[i]:.6f};{lon0[i]:.6f}">')
                for s in range(1, int(n_sig[i])):
                    la = lat0[i] + 0.01 * s
                    lo = lon0[i] + 0.01 * s
                    head_meta.append(
                        f'<meta name="geo.position" content="{la:.6f};{lo:.6f}">')
            elif kind[i] == 1:  # track: short polyline
                pts = []
                for s in range(4):
                    pts.append(f"{lat0[i] + 0.005 * s:.6f},{lon0[i] + 0.008 * s:.6f}")
                head_meta.append(f'<meta name="geo.track" content="{" ".join(pts)}">')
            else:  # footprint: small quad polygon
                d = 0.004
                ring = [(lat0[i] - d, lon0[i] - d), (lat0[i] - d, lon0[i] + d),
                        (lat0[i] + d, lon0[i] + d), (lat0[i] + d, lon0[i] - d)]
                content = " ".join(f"{la:.6f},{lo:.6f}" for la, lo in ring)
                head_meta.append(f'<meta name="geo.footprint" content="{content}">')
        text = "\n".join(paras)
        html = (f'<html><head><title>{cname}</title>{"".join(head_meta)}</head>'
                f'<body>{"".join(f"<p>{p}</p>" for p in paras)}</body></html>')
        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts.append(text)

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang.tolist(), pa.string()),
    })


def n_pages_for_sf_dir(sf_dir: str) -> int:
    """Page count scales with the driver's sf tables: lineitem/3
    (sf0.001 → ~2k pages, sf0.01 → ~20k, sf0.1 → ~200k). lineitem is
    the only table that scales across all three sf dirs."""
    import pyarrow.parquet as pq
    li = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet"))
    return max(1000, int(li.metadata.num_rows) // 3)


def pages_dataset(n: int, parallelism: int = -1):
    """Distributed deterministic generation: range(n) → map_batches."""
    import ray.data as rd
    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(page_batch, batch_format="numpy", batch_size=8192)


# bump when page_batch's synthesis changes so stale /tmp caches are
# never served to oracle-gated queries
PAGES_CACHE_VERSION = 1


def ensure_pages_parquet(n: int, cache_root: str = "/tmp/tilemaker_ray_cache") -> str:
    """Write (once) and return the path of a cached pages parquet for
    ``n`` rows. bench.py and the pages-derived queries read this so
    generation cost is not re-timed per consumer. Cache key carries
    SEED and PAGES_CACHE_VERSION (content identity, not just row
    count); the temp dir is per-process so two cold-starting drivers
    cannot clobber each other's in-flight write."""
    out = os.path.join(cache_root,
                       f"pages_v{PAGES_CACHE_VERSION}_s{SEED}_{n}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(cache_root, exist_ok=True)
    tmp = f"{out}.tmp.{os.getpid()}"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    # many small files so a later read (and its fused map chain) can
    # parallelize past the writer's CPU count
    n_blocks = max(64, n // 4096)
    pages_dataset(n, parallelism=n_blocks).write_parquet(
        tmp, max_rows_per_file=4096)
    shutil.rmtree(out, ignore_errors=True)
    try:
        os.replace(tmp, out)
    except OSError:
        # a concurrent writer completed the swap first — its copy is
        # byte-identical (deterministic generation); keep it. But an
        # OSError with NO completed destination (e.g. cross-device
        # tmp) is a real failure, not a lost race — re-raise it
        shutil.rmtree(tmp, ignore_errors=True)
        # the winner writes `done` only AFTER its os.replace lands:
        # classify by the swapped OUTPUT too, or a loser racing inside
        # that window re-raises despite a complete byte-identical copy
        if os.path.exists(done) or os.path.exists(out):
            return out
        raise
    with open(done, "w") as f:
        f.write(str(n))
    return out
