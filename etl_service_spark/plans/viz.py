"""Run-structure raster render — PNG, no external libs.

Reference parity: Vizualiser.cs:456-1692 draws the run graph with
SkiaSharp onto a #434C5E canvas (one column per hierarchy level, one
box per run, success-colored, parent→child connectors) and attaches
the PNG to the result mail (Helper.cs:723-746). SURVEY scoped pixel
rendering out and plans/runlog.py already emits DOT; this module
closes the raster gap with the SAME inputs (run_tree_sql + per-level
success flags) drawn into a numpy framebuffer and encoded as PNG via
stdlib zlib — the PNG format is public (RFC 2083), no image library
needed. Box labels are not rasterized (no font engine in-container);
identity lives in the DOT/HTML renderings, the raster shows structure
+ status at a glance, which is what the mail attachment is for.

Scale note: a run graph is one workflow run — tens to hundreds of
nodes — so rendering is driver-side by design, like the report
assembly in plans/report.py. The analytics feeding it stay in Spark.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import SparkSession

from . import runlog as RL

# reference palette: canvas #434C5E (Vizualiser.cs:475), success/fail
# greens/reds from the mail header (Helper.cs:646,666)
COLORS = {
    "bg": (0x43, 0x4C, 0x5E),
    "ok": (0x44, 0xD4, 0x78),
    "fail": (0xC4, 0x25, 0x4A),
    "open": (0x9A, 0xA3, 0xB2),
    "edge": (0xEB, 0xEB, 0xEB),
}

BOX_W, BOX_H = 120, 36
COL_GAP, ROW_GAP, MARGIN = 70, 18, 24


def png_encode(rgb) -> bytes:
    """HxWx3 uint8 framebuffer → PNG bytes (8-bit truecolor, filter 0)."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _line(fb, x0: int, y0: int, x1: int, y1: int, color) -> None:
    """1-px connector via uniform sampling (enough for box-to-box)."""
    import numpy as np

    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    t = np.linspace(0.0, 1.0, n + 1)
    xs = np.round(x0 + (x1 - x0) * t).astype(int)
    ys = np.round(y0 + (y1 - y0) * t).astype(int)
    fb[ys, xs] = color


def render_run_graph_png(spark: SparkSession, out_path: str | None = None) -> bytes:
    """Render the current runlog's structure: levels as columns
    (workflow → package → realization → step), runs as boxes filled
    green/red/gray by success flag, parent→child connectors, dark
    canvas. Returns PNG bytes; optionally also writes ``out_path``."""
    import numpy as np

    tree = sorted(
        spark.sql(RL.run_tree_sql()).collect(), key=lambda r: (r["level"], r["node"])
    )
    flags: dict[str, bool | None] = {}
    for lv in RL.LEVELS:
        for r in spark.sql(RL.current_state_sql(lv)).collect():
            flags[f"{lv[0].upper()}{r['run_id']}"] = r["Erfolgreich"]

    by_level: dict[str, list] = {lv: [] for lv in RL.LEVELS}
    for r in tree:
        by_level[r["level"]].append(r)
    for lv in RL.LEVELS:
        by_level[lv].sort(key=lambda r: r["node"])

    most = max((len(v) for v in by_level.values()), default=1) or 1
    n_cols = len(RL.LEVELS)
    width = 2 * MARGIN + n_cols * BOX_W + (n_cols - 1) * COL_GAP
    height = 2 * MARGIN + most * BOX_H + (most - 1) * ROW_GAP
    fb = np.empty((height, width, 3), dtype=np.uint8)
    fb[:, :] = COLORS["bg"]

    pos: dict[str, tuple[int, int]] = {}  # node -> (x0, y0)
    for ci, lv in enumerate(RL.LEVELS):
        x0 = MARGIN + ci * (BOX_W + COL_GAP)
        for ri, r in enumerate(by_level[lv]):
            pos[r["node"]] = (x0, MARGIN + ri * (BOX_H + ROW_GAP))

    # connectors first so boxes paint over line ends
    for r in tree:
        if r["parent"] != "ROOT" and r["parent"] in pos:
            px, py = pos[r["parent"]]
            cx, cy = pos[r["node"]]
            _line(
                fb,
                px + BOX_W,
                py + BOX_H // 2,
                cx,
                cy + BOX_H // 2,
                COLORS["edge"],
            )

    for r in tree:
        x0, y0 = pos[r["node"]]
        ok = flags.get(r["node"])
        fill = COLORS["ok"] if ok else (COLORS["fail"] if ok is False else COLORS["open"])
        fb[y0 : y0 + BOX_H, x0 : x0 + BOX_W] = COLORS["edge"]  # 1px border
        fb[y0 + 1 : y0 + BOX_H - 1, x0 + 1 : x0 + BOX_W - 1] = fill

    png = png_encode(fb)
    if out_path:
        with open(out_path, "wb") as fh:
            fh.write(png)
    return png
