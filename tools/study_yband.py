"""Offline study: is a second (y) band worth building for the rank-3
banded spread kernels? (VERDICT r3 item 2b; companion to the Mosaic
feasibility probe tools/probe_dynsub.py.)

Method: for the 3D headline geometry (fine 256^3, tile (128,16,64),
pad 4, chunk 512, sub 128, 800k uniform points), order points within
each tile by several (z,y) cell curves and compute the STATIC
worst-case sub-chunk spans that a double-banded kernel would need
(the band is static: one bad window sets it globally).

Result (recorded 2026-08-20, numpy, seed 0):

    z-only cell4   : band_z=16 band_y=24 -> M_rows=384  (current)
    serp  cz4 cy4  : band_z=16 band_y=24 -> M_rows=384
    serp  cz8 cy4  : band_z=24 band_y=20 -> M_rows=480
    serp  cz8 cy8  : band_z=24 band_y=24 -> M_rows=576
    serp  cz16 cy4 : band_z=40 band_y=16 -> M_rows=640
    morton c4      : band_z=20 band_y=24 -> M_rows=480

Every curve's worst window already spans >= the full E1=24 in y (turn
windows straddle cell rows), so the double-band's Khatri-Rao fold
would contract >= the current 384 rows: the y-band NEVER pays at this
geometry. Root cause: the additive 2*half_width = 8 rows per axis
dominates once the per-axis data span is small, and a static band must
cover the worst sub-chunk. Chunk-aligned cells (pad each cell's points
to a sub-chunk) shrink M_rows but inflate the padded slot count (and
with it the values gather + VPU/store stages) by more than the MXU
saving at every cell size tried (8x8 cells: M_rows 256 (-33% MXU) vs
+22% slots — net ~zero; 4x4: M_rows 144 vs 2.6x slots — net negative).

Conclusion: axis-0-only banding is at its structural floor for the 3D
headline; the remaining per-call cost above the slot-order apply path
is the values-payload permutation gather (platform floor, see
tools/gather_scale.py). Kept as a runnable study.
"""
import numpy as np


def band_for(pts, tid, tile, hw, sub, order_key, cell_z, cell_y):
    zc = ((pts[:, 0] % tile[0]) // cell_z).astype(int)
    yc = ((pts[:, 1] % tile[1]) // cell_y).astype(int)
    nzc, nyc = tile[0] // cell_z, tile[1] // cell_y
    if order_key == 'z':
        cellid = zc
    elif order_key == 'serp':
        yy = np.where(zc % 2 == 0, yc, nyc - 1 - yc)
        cellid = zc * nyc + yy
    elif order_key == 'morton':
        def interleave(a, b, nb):
            out = np.zeros_like(a)
            for i in range(nb):
                out |= ((a >> i) & 1) << (2 * i + 1)
                out |= ((b >> i) & 1) << (2 * i)
            return out
        nb = max(nzc - 1, nyc - 1).bit_length()
        cellid = interleave(zc, yc, nb)
    bz_max = by_max = 0
    order = np.lexsort((cellid, tid))
    stid = tid[order]
    bounds = np.searchsorted(stid, np.arange(stid.max() + 2))
    for t in range(len(bounds) - 1):
        lo, hi = bounds[t], bounds[t + 1]
        if hi <= lo:
            continue
        zs = pts[order[lo:hi], 0] % tile[0]
        ys = pts[order[lo:hi], 1] % tile[1]
        for s in range(lo, hi, sub):
            e = min(s + sub, hi)
            zw, yw = zs[s - lo:e - lo], ys[s - lo:e - lo]
            bz = (np.ceil(zw.max() + hw) - 1) - \
                (np.floor(zw.min() - hw) + 1) + 1
            by = (np.ceil(yw.max() + hw) - 1) - \
                (np.floor(yw.min() - hw) + 1) + 1
            bz_max, by_max = max(bz_max, bz), max(by_max, by)
    return int(-(-bz_max // 4) * 4), int(-(-by_max // 4) * 4)


def main():
    rng = np.random.default_rng(0)
    m, fine, tile, pad, hw, sub = 800_000, 256, (128, 16, 64), 4, 4.0, 128
    pts = rng.uniform(0, fine, (m, 3))
    t = [(pts[:, d] // tile[d]).astype(int) for d in range(3)]
    tid = (t[0] * (fine // tile[1]) + t[1]) * (fine // tile[2]) + t[2]
    e1 = tile[1] + 2 * pad
    for name, args in [("z-only cell4", ('z', 4, 16)),
                       ("serp cz4 cy4", ('serp', 4, 4)),
                       ("serp cz8 cy4", ('serp', 8, 4)),
                       ("serp cz8 cy8", ('serp', 8, 8)),
                       ("serp cz16 cy4", ('serp', 16, 4)),
                       ("morton c4", ('morton', 4, 4))]:
        bz, by = band_for(pts, tid, tile, hw, sub, *args)
        print(f"{name}: band_z={bz} band_y={by} -> "
              f"M_rows={bz * min(by, e1)} (current 16*{e1}={16 * e1})")


if __name__ == "__main__":
    main()
