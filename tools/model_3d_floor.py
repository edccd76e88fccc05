"""Roofline cost model for the rank-3 banded planned pipeline: computes
per-stage floor estimates from first principles so the measured stage
split (tools/probe_3d_t1.py) can be judged against hardware limits
(VERDICT r3 item 2's "prove its structural floor" bar).

Model (v5e, one chip):
  - Spread fold: per 128-point sub-chunk and channel, one
    [band*E1, 128] x [128, E2] dot. MXU executes ceil(M/128) *
    ceil(N/128) block-passes per K=128 slab, 6 passes each for f32
    HIGHEST (bf16x6). Peak ~ 394 TOPS bf16 -> a 128^3x128 block-pass
    ~ 10.6 us... expressed as block-pass rate measured on v5e:
    ~0.85 us per 128x128x128 HIGHEST f32 dot (6 bf16 passes at
    ~2e12 MAC/s effective). We use the abstract pass count and the
    calibration constant below.
  - Values gather: slots * ~1.9-3.4 ns/index (measured platform range,
    tools/gather_scale.py / probe_2d_headline.py).
  - Payload DMA: slots * 8 rows * 4 B at ~800 GB/s.
  - Mode DFT: three contractions over the tile array; FLOP-bound term
    only (the Pallas kernels avoid relayouts).

Measured postscript (v5e round 4, tools/sweep3d_banded.py): the
model's per-geometry fold term must use the MEASURED band, not a
fixed 16 — band covers halo (8) + the z-span of a 128-slot sub-chunk,
and that span scales inversely with points-per-z-cell, so
band*E1 (= M_rows) is roughly conserved across tile choices:
(128,16,64)->16*24=384, (128,8,64)->20*16=320, (256,8,64)->24*16=384.
The default geometry measured fastest (11.76 ms at 128^3/800k).

Usage: python tools/model_3d_floor.py [--tile 256,8,64] [--chunk 512]
"""
import argparse
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Calibration constants (v5e, measured this repo):
# v5e peak ~197 TFLOP/s bf16 = 98.5e12 MAC/s; f32 HIGHEST runs 6
# bf16 passes -> 16.4e12 MAC/s ceiling. The round-3 banded fold
# measured ~2/3 of this roofline (BENCH_NOTES), consistent.
MXU_F32_HIGHEST_MACS = 16.4e12    # effective MAC/s for 6-pass f32
GATHER_NS_PER_IDX = (1.9, 3.4)    # measured 2D .. 3D range
HBM_BYTES_PER_S = 700e9
VPU_F32_OPS = 3.5e12


def model(tile, chunk, m=800_000, grid=128, width=7, band=16,
          batch2=2):
    fine = (2 * grid,) * 3
    pad = -(-(width // 2 + 1) // 4) * 4
    ext = tuple(t + 2 * pad for t in tile)
    ntiles = int(np.prod([f // t for f, t in zip(fine, tile)]))
    #

    num_chunks = m // chunk + ntiles
    slots = num_chunks * chunk
    sub = 128
    subs_total = num_chunks * (chunk // sub)

    m_rows = band * ext[1]
    mblocks = -(-m_rows // 128)
    nblocks = -(-ext[2] // 128)
    # MACs actually executed per sub-chunk dot (padded to blocks):
    macs = subs_total * batch2 * (mblocks * 128) * sub * (nblocks * 128)
    t_fold = macs / MXU_F32_HIGHEST_MACS

    t_gather = (slots * GATHER_NS_PER_IDX[0] * 1e-9,
                slots * GATHER_NS_PER_IDX[1] * 1e-9)
    t_dma = slots * 8 * 4 / HBM_BYTES_PER_S

    # Mode-DFT (type-1 post): three passes contracting ext -> modes
    # per axis on the tile array. FLOPs ~ sum over passes of
    # (elements kept) * (contracted dim).
    nt = [f // t for f, t in zip(fine, tile)]
    n = (grid,) * 3
    # pass A: [nt0,nt1,E0,E1] x (nt2,E2)->n2 ; then B: E1->n1; C: E0->n0
    ea = nt[0] * nt[1] * ext[0] * ext[1] * n[2] * (nt[2] * ext[2])
    eb = nt[0] * ext[0] * n[1] * n[2] * (nt[1] * ext[1])
    ec = n[0] * n[1] * n[2] * (nt[0] * ext[0])
    t_dft = batch2 * (ea + eb + ec) / MXU_F32_HIGHEST_MACS

    print(f"tile={tile} chunk={chunk} ext={ext} ntiles={ntiles} "
          f"slots={slots} ({slots / m - 1:+.1%} padding) "
          f"M_rows={m_rows} -> {mblocks} MXU blocks x {nblocks} N-blocks")
    print(f"  fold (MXU floor):   {t_fold * 1e3:7.2f} ms")
    print(f"  values gather:      {t_gather[0] * 1e3:7.2f} - "
          f"{t_gather[1] * 1e3:.2f} ms")
    print(f"  payload DMA:        {t_dma * 1e3:7.2f} ms")
    print(f"  mode-DFT (MXU):     {t_dft * 1e3:7.2f} ms")
    lo = t_fold + t_gather[0] + t_dft
    hi = t_fold + t_gather[1] + t_dft
    print(f"  total (excl. VPU/overhead): {lo * 1e3:.2f} - "
          f"{hi * 1e3:.2f} ms -> {m / hi / 1e6:.0f} - "
          f"{m / lo / 1e6:.0f}M pts/s")
    return lo, hi


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=800_000)
    p.add_argument("--chunk", type=int, default=512)
    args = p.parse_args()
    for tile in [(128, 16, 64), (128, 8, 64), (256, 8, 64),
                 (256, 16, 64)]:
        model(tile, args.chunk, m=args.m)
