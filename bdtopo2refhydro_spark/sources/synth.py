"""Deterministic synthetic fixtures (FIXTURES.md §B) — no RNG state, no
external data: every value derives from splitmix64 of the row key, so the
same table materializes identically at any parallelism or scale.

The tables stand in for the reference's GPKG layers:
  pages            ~ BD TOPO extraction source         (README.md:51-103)
  edges            ~ troncon_hydrographique_cours_d_eau (stream segments)
  outlet_polygons  ~ exutoire_buffer50                  (create_exutoire.py:100-104)
  surfaces         ~ surface_hydrographique             (create_5m_width_hydro_network.py:75)
  zones            ~ clip masks                         (create_5m_width_hydro_network.py:78-79)
  corrections      ~ corr_reseau_hydrographique layers  (create_reference_hydro_workflow.py:83-89)

Graph shape: edges 0..n_tree-1 form a binary forest via parent(i) = i // 2
(i=0 is the outlet-adjacent root). Water flows child → parent, encoded as
LineString from pos(child) (NODEA end) to pos(parent) (NODEB end). A seeded
fraction is stored flow-reversed (exercises fix_direction.py:78-88) and a
seeded fraction duplicated under a new url (exercises
native:deleteduplicategeometries, create_connected_reference_hydro.py:150-156).
The remaining ~30% are disconnected noise segments.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..geom.wkb import linestring_wkb, polygon_wkb

EXTENT = 100_000.0  # planar meters, EPSG:2154-like
LANGS = ["fr", "en", "de", "es"]
NATURES = [
    "Ecoulement naturel",
    "Ecoulement naturel",
    "Ecoulement naturel",
    "Ecoulement naturel",
    "Ecoulement naturel",
    "Ecoulement naturel",
    "Canal",
    "Conduit forcé",
    "Conduit buse",
    "Ecoulement canalisé",
]


def splitmix64(x):
    """Vectorized deterministic 64-bit mix (public-domain splitmix64)."""
    z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _h(seq, salt: int):
    return splitmix64(np.asarray(seq, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(salt))


def url_of(seq: int) -> str:
    h = int(_h([seq], 0)[0])
    return f"https://site{h % 1000}.example/p/{h}"


def _html_of(url: str) -> bytes:
    return (
        f"<html><head><title>{url}</title></head>"
        f"<body><p>page for {url}</p></body></html>"
    ).encode()


def _text_of(url: str) -> str:
    # deterministic "extraction" of the html — byte-identity per url is the
    # gated invariant (BASELINE.json input_hint)
    return f"{url}\npage for {url}"


def make_pages_pdf(n: int) -> pd.DataFrame:
    seq = np.arange(n, dtype=np.uint64)
    h = _h(seq, 0)
    urls = [url_of(i) for i in range(n)]
    epoch = dt.datetime(2021, 1, 1)
    ts = [epoch + dt.timedelta(seconds=int(v % np.uint64(31_536_000))) for v in h]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": [_html_of(u) for u in urls],
            "text": [_text_of(u) for u in urls],
            "lang": [LANGS[int(v % np.uint64(4))] for v in h],
        }
    )


def _depth(i: int) -> int:
    return int(np.floor(np.log2(i + 1)))


def node_pos(i: int, _memo: dict | None = None) -> tuple[float, float]:
    """Deterministic node position: a hash-driven random walk up the
    ancestor chain from the root — children sit 1-5 km from their parent,
    so edges are LOCAL (a handful of grid cells each), like real stream
    segments, instead of spanning the extent. y grows upstream; the root
    sits in the outlet band."""
    if _memo is not None and i in _memo:
        return _memo[i]
    if i == 0:
        pos = (EXTENT / 2.0, 1000.0)
    else:
        px, py = node_pos(i // 2, _memo)
        h1 = int(_h([i], 11)[0])
        h2 = int(_h([i], 13)[0])
        x = px + float(h1 % 4000) - 2000.0
        y = py + 500.0 + float(h2 % 2500)
        pos = (float(np.clip(x, 500.0, EXTENT - 500.0)), y)
    if _memo is not None:
        _memo[i] = pos
    return pos


def _line_coords(a: tuple[float, float], b: tuple[float, float], seed: int):
    """2-8 vertex path from a to b with deterministic interior jitter."""
    h = int(_h([seed], 17)[0])
    k = h % 7  # 0..6 interior points
    t = np.linspace(0.0, 1.0, k + 2)
    xs = a[0] + t * (b[0] - a[0])
    ys = a[1] + t * (b[1] - a[1])
    if k:
        jit = (_h(np.arange(k) + seed * 1000, 19).astype(np.float64) % 200.0) - 100.0
        xs[1:-1] += jit
        jit2 = (_h(np.arange(k) + seed * 1000, 23).astype(np.float64) % 200.0) - 100.0
        ys[1:-1] += jit2
    return np.column_stack([xs, ys])


def make_edges_pdf(n: int, tree_frac: float = 0.7) -> pd.DataFrame:
    """One edge per page url. Edges [1, n_tree) are tree links child→parent;
    [n_tree, n) are disconnected noise. Row 0 is the outlet edge: a short
    segment from pos(0) into the outlet band (y < 1500)."""
    n_tree = max(int(n * tree_frac), 2)
    rows = []
    memo: dict = {}
    for i in range(n):
        url = url_of(i)
        h = int(_h([i], 29)[0])
        if i == 0:
            a = node_pos(0, memo)
            coords = np.array([[a[0], a[1]], [a[0], 500.0]])
        elif i < n_tree:
            a = node_pos(i, memo)          # upstream (child)
            b = node_pos(i // 2, memo)     # downstream (parent)
            coords = _line_coords(a, b, i)
        else:
            x0 = float(h % int(EXTENT))
            y0 = 40_000.0 + float((h >> 8) % 50_000)
            ang = (h % 360) * np.pi / 180.0
            ln = 200.0 + float(h % 3000)
            coords = np.array(
                [[x0, y0], [x0 + ln * np.cos(ang), y0 + ln * np.sin(ang)]]
            )
        reversed_flag = (i != 0) and (h % 23 == 0)
        wkb = linestring_wkb(coords[::-1] if reversed_flag else coords)
        rows.append(
            {
                "url": url,
                "geom_wkb": wkb,
                "nature": NATURES[h % 10] if i != 0 else "Ecoulement naturel",
                "fictif": h % 13 == 0,
                "persistance": "Permanent" if h % 3 else "Intermittent",
                "classe_de_largeur": ["Entre 0 et 5 m", "Entre 5 et 15 m",
                                      "Entre 15 et 50 m"][h % 3],
                "is_tree": i < n_tree,
                "flow_reversed": reversed_flag,
            }
        )
    # seeded duplicate geometries under fresh urls (url key shifted by 10^9)
    dups = [
        {**r, "url": url_of(10**9 + j)}
        for j, r in enumerate(rows)
        if int(_h([j], 31)[0]) % 29 == 0
    ]
    return pd.DataFrame(rows + dups)


def _rect(x0, y0, x1, y1):
    return polygon_wkb(
        np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)
    )


def make_outlet_polygons_pdf() -> pd.DataFrame:
    """The outlet band: rectangles along y < 1500 (the root edge dips to
    y=500, so exactly the root edge intersects)."""
    return pd.DataFrame(
        {
            "outlet_id": [0, 1, 2],
            "kind": ["limite_terre_mer", "plan_d_eau_line", "frontiere"],
            "geom_wkb": [
                _rect(0, 0, EXTENT, 1500.0),
                _rect(10_000, 0, 20_000, 1200.0),
                _rect(80_000, 0, 95_000, 900.0),
            ],
        }
    )


def make_surfaces_pdf() -> pd.DataFrame:
    """Water-surface polygons placed for hand-checkable zonal ratios."""
    return pd.DataFrame(
        {
            "surface_id": [0, 1, 2],
            "nature": ["Ecoulement_naturel", "Retenue-barrage", "Ecoulement_naturel"],
            "geom_wkb": [
                _rect(0, 0, EXTENT, 20_000),
                _rect(30_000, 20_000, 70_000, 60_000),
                _rect(0, 90_000, 20_000, EXTENT),
            ],
        }
    )


def make_zones_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "zone_id": [0],
            "name": ["zone_test"],
            "geom_wkb": [_rect(0, 0, EXTENT, EXTENT)],
        }
    )


def make_corrections_pdf(n_edges: int) -> pd.DataFrame:
    """Curated fix tables analog (FIXTURES.md §B6): deterministic subsets of
    edge urls, one action each; 'connection' rows carry brand-new urls."""
    rows = []
    for j in range(max(n_edges // 50, 2)):
        new_url = url_of(2 * 10**9 + j)
        a = (float(1000 + j * 37), float(70_000 + j * 13))
        rows.append(
            {
                "url": new_url,
                "action": "connection",
                "new_geom_wkb": linestring_wkb(
                    np.array([[a[0], a[1]], [a[0] + 500.0, a[1] + 200.0]])
                ),
            }
        )
    for i in range(1, n_edges):
        # direction corrections target exactly the flow-reversed edges
        # (same hash rule as make_edges_pdf), so corrections → coherent flow
        if int(_h([i], 29)[0]) % 23 == 0:
            rows.append({"url": url_of(i), "action": "direction", "new_geom_wkb": None})
        h = int(_h([i], 37)[0])
        m = h % 97
        if m == 1:
            rows.append(
                {
                    "url": url_of(i),
                    "action": "geom",
                    "new_geom_wkb": linestring_wkb(
                        np.array([[float(h % 1000), 50_000.0],
                                  [float(h % 1000) + 300.0, 50_300.0]])
                    ),
                }
            )
        elif m == 2:
            rows.append(
                {"url": url_of(i), "action": "suppr_canal_multichenal",
                 "new_geom_wkb": None}
            )
    return pd.DataFrame(rows)


def edges_batch_pdf(ids: np.ndarray, n_tree: int) -> pd.DataFrame:
    """Vectorized edge generation for an arbitrary id batch — the same
    formulas as make_edges_pdf (minus duplicate injection), usable inside
    mapInPandas for distributed synthesis at bench scale."""
    rows = []
    memo: dict = {}
    for i in ids.tolist():
        h = int(_h([i], 29)[0])
        if i == 0:
            a = node_pos(0, memo)
            coords = np.array([[a[0], a[1]], [a[0], 500.0]])
        elif i < n_tree:
            coords = _line_coords(node_pos(i, memo), node_pos(i // 2, memo), i)
        else:
            x0 = float(h % int(EXTENT))
            y0 = 40_000.0 + float((h >> 8) % 50_000)
            ang = (h % 360) * np.pi / 180.0
            ln = 200.0 + float(h % 3000)
            coords = np.array(
                [[x0, y0], [x0 + ln * np.cos(ang), y0 + ln * np.sin(ang)]]
            )
        reversed_flag = (i != 0) and (h % 23 == 0)
        rows.append(
            {
                "url": url_of(i),
                "geom_wkb": linestring_wkb(coords[::-1] if reversed_flag else coords),
                "nature": NATURES[h % 10] if i != 0 else "Ecoulement naturel",
            }
        )
    return pd.DataFrame(rows, columns=["url", "geom_wkb", "nature"])


def edges_df_dist(spark, n: int, tree_frac: float = 0.7):
    """Distributed deterministic edge synthesis: spark.range(n) →
    mapInPandas. Generation parallelizes across executors and the result is
    identical at any partitioning (every value derives from the row id).
    This is how bench-scale inputs (10^6+) are built — never driver-side."""
    n_tree = max(int(n * tree_frac), 2)

    def gen(batches):
        for pdf in batches:
            yield edges_batch_pdf(pdf["id"].to_numpy(), n_tree)

    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, "url string, geom_wkb binary, nature string")
    )


# ------------------------------------------------------- Spark wrappers

def _to_df(spark, pdf: pd.DataFrame, schema: str):
    return spark.createDataFrame(pdf, schema=schema)


def pages_df(spark, n: int):
    return _to_df(
        spark, make_pages_pdf(n),
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def edges_df(spark, n: int, tree_frac: float = 0.7):
    return _to_df(
        spark, make_edges_pdf(n, tree_frac),
        "url string, geom_wkb binary, nature string, fictif boolean, "
        "persistance string, classe_de_largeur string, is_tree boolean, "
        "flow_reversed boolean",
    )


def outlet_polygons_df(spark):
    return _to_df(
        spark, make_outlet_polygons_pdf(),
        "outlet_id long, kind string, geom_wkb binary",
    )


def surfaces_df(spark):
    return _to_df(
        spark, make_surfaces_pdf(),
        "surface_id long, nature string, geom_wkb binary",
    )


def zones_df(spark):
    return _to_df(spark, make_zones_pdf(), "zone_id long, name string, geom_wkb binary")


def corrections_df(spark, n_edges: int):
    return _to_df(
        spark, make_corrections_pdf(n_edges),
        "url string, action string, new_geom_wkb binary",
    )
