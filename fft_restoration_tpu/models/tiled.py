"""Tiled restoration for arbitrarily large frames.

The single-frame pipeline transforms the whole padded frame at once,
so its working set grows with the image: a 16384² frame is ~12 GB of
SoA planes — past a v5e chip's HBM — and even where it fits, one giant
FFT wastes the pow2 pad on non-pow2 giants. This module bounds device
memory to a FIXED tile working set regardless of image size, the way a
production service restores gigapixel scans: cover the frame with
overlapping power-of-two tiles, deconvolve every tile independently
(a batched stack through restore_planes — peak-throughput shapes, one
PSF spectrum), and stitch the tile CORES (overlap-discard).

Correctness model: deconvolution is not local, but the Wiener/CLS
kernels' spatial support decays fast away from the blur extent, so a
margin of a few PSF lengths makes the tile interior match the global
restore; each tile is edge-tapered (models/edgetaper.py) so the
circular wrap of its own boundary does not ring into the core. The
stitched result is an APPROXIMATION of the global restore — there is
no oracle counterpart, and the CLI marks it as such — verified in
tests against the global pipeline on scenes that fit both paths
(tests/test_tiled.py).

Brightness consistency: tiles are restored RAW (restore_planes
normalize=False — the filter is linear, so same-extent raw planes are
directly comparable), stitched, then min-max normalized and white-
balanced GLOBALLY, exactly one stretch for the whole frame. Per-tile
normalization would seam at every core boundary. ('rl' tiles come back
clipped to [0,1], flux-calibrated — they are stitched and used as-is,
matching the RL pipeline's no-stretch semantics.)

The reference has no counterpart (it loads the whole frame always,
serial.cpp:22-25); cited as the scaling member of the restoration
family.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def tile_grid(extent: int, tile: int, core: int, overlap: int):
    """Start offsets of tiles and their core claims along one axis.

    Returns (tile_starts, core_spans): for each tile i, the tile reads
    [tile_starts[i], tile_starts[i] + tile) of the image and its core
    claims [core_spans[i][0], core_spans[i][1]). Tiles are SHIFTED to
    stay fully inside the image (so every tile is dense image content,
    one jit shape), which grows the margin at the trailing edge; the
    leading/trailing frame borders keep margins < overlap, where there
    is no neighbor content anyway (the per-tile edge taper owns the
    frame border, as in the untiled pipeline)."""
    if extent <= tile:
        return [0], [(0, extent)]
    starts, cores = [], []
    for cy in range(0, extent, core):
        c1 = min(cy + core, extent)
        if cy >= c1:
            break
        t0 = min(max(cy - overlap, 0), extent - tile)
        starts.append(t0)
        cores.append((cy, c1))
    return starts, cores


def _chunk_restore_fn(
    tile_h: int,
    tile_w: int,
    live_h: int,
    live_w: int,
    psf_length: int,
    fft_backend: str,
    fft_engine: str,
    filter_name: str,
    rl_iters: int,
    psf_type,
):
    """jit-compiled (B, 3, tile_h, tile_w) uint8 -> raw restored planes.

    tile_h/tile_w are pow2 so the pad is free; live_h/live_w mark the
    dense extent when the whole image is smaller than one tile (the
    zero-pad case the edge taper is built for)."""
    from fft_restoration_tpu.models.edgetaper import edge_taper_planes
    from fft_restoration_tpu.models.pipeline import restore_planes
    from fft_restoration_tpu.ops.psf import make_psf

    def fn(tiles_u8, angle, K):
        psf = make_psf(psf_type, psf_length, angle)
        x = tiles_u8.astype(jnp.float32) / jnp.float32(255.0)
        x = jnp.pad(
            x,
            (
                (0, 0),
                (0, 0),
                (0, tile_h - x.shape[-2]),
                (0, tile_w - x.shape[-1]),
            ),
        )
        # taper every tile toward its own circular blur: the tile
        # boundary is an artificial cut through the scene, exactly the
        # wrap discontinuity the taper suppresses at frame borders
        x = edge_taper_planes(
            x, psf, (live_h, live_w),
            fft_backend=fft_backend, fft_engine=fft_engine,
        )
        return restore_planes(
            x, psf, K, fft_backend=fft_backend, filter_name=filter_name,
            fft_engine=fft_engine, rl_iters=rl_iters, normalize=False,
        )

    return jax.jit(fn)


def tiled_restore_image(
    img_bgr: np.ndarray,
    psf_length: int,
    psf_angle: float,
    K: float = 0.01,
    *,
    tile: int = 1024,
    overlap: int | None = None,
    chunk: int = 16,
    fft_backend: str = "matmul",
    fft_engine: str = "mxu",
    filter_name: str = "wiener",
    rl_iters: int = 10,
    psf_type="motion",
    white_balance: bool = True,
) -> np.ndarray:
    """(H, W, 3) uint8 BGR of ANY size -> (H, W, 3) uint8 restored,
    with device memory bounded by `chunk` tiles of `tile`² regardless
    of H and W.

    tile must be a power of two (the tile transform then pays zero pow2
    pad). overlap defaults to max(2*psf_length, 32) — the discarded
    margin between a tile's read extent and its stitched core; larger
    overlap = closer to the global restore, more redundant compute
    (read amplification = (tile/(tile-2*overlap))²).
    """
    from fft_restoration_tpu.utils.padding import is_power_of_two

    img = np.asarray(img_bgr)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) BGR, got {img.shape}")
    if not is_power_of_two(tile):
        raise ValueError(f"tile must be a power of two, got {tile}")
    if overlap is None:
        overlap = max(2 * psf_length, 32)
    core = tile - 2 * overlap
    if core < 8:
        raise ValueError(
            f"tile {tile} too small for overlap {overlap} "
            f"(core {core} < 8); raise --tile or lower the overlap"
        )
    h, w = img.shape[:2]

    ys, ycores = tile_grid(h, tile, core, overlap)
    xs, xcores = tile_grid(w, tile, core, overlap)
    th, tw = min(tile, h), min(tile, w)  # dense tile read extent
    if psf_length > min(
        1 << (th - 1).bit_length(), 1 << (tw - 1).bit_length()
    ):
        raise ValueError(
            f"psf_length {psf_length} exceeds the tile DFT extent"
        )

    # gather the tile stack (host): (B, 3, th, tw) uint8
    tiles = np.empty((len(ys) * len(xs), 3, th, tw), np.uint8)
    b = 0
    for y0 in ys:
        for x0 in xs:
            tiles[b] = np.moveaxis(
                img[y0 : y0 + th, x0 : x0 + tw], -1, 0
            )
            b += 1

    fn = _chunk_restore_fn(
        # pad the read extent up to the pow2 tile inside the graph
        1 << (th - 1).bit_length(), 1 << (tw - 1).bit_length(),
        th, tw, psf_length, fft_backend, fft_engine, filter_name,
        rl_iters, psf_type,
    )
    ang = jnp.float32(psf_angle)
    k = jnp.float32(K)

    raw = np.empty((tiles.shape[0], 3, th, tw), np.float32)
    for i in range(0, tiles.shape[0], chunk):
        blk = tiles[i : i + chunk]
        n = blk.shape[0]
        if n < chunk:
            # pad the last chunk to the fixed batch (one compiled graph)
            blk = np.concatenate(
                [blk, np.repeat(blk[-1:], chunk - n, axis=0)]
            )
        out = np.asarray(fn(jnp.asarray(blk), ang, k))
        raw[i : i + n] = out[:n, :, :th, :tw]

    # stitch the cores into the global raw planes
    planes = np.empty((3, h, w), np.float32)
    b = 0
    for y0, (cy0, cy1) in zip(ys, ycores):
        for x0, (cx0, cx1) in zip(xs, xcores):
            planes[:, cy0:cy1, cx0:cx1] = raw[
                b, :, cy0 - y0 : cy1 - y0, cx0 - x0 : cx1 - x0
            ]
            b += 1

    # ONE global stretch (the untiled pipeline's semantics, at frame
    # scope); RL tiles are already flux-calibrated in [0,1]
    if filter_name == "rl":
        planes = np.clip(planes, 0.0, 1.0)
    else:
        lo = planes.min(axis=(-2, -1), keepdims=True)
        hi = planes.max(axis=(-2, -1), keepdims=True)
        planes = (planes - lo) / np.where(hi > lo, hi - lo, 1.0)

    merged = np.moveaxis(planes, 0, -1)
    if white_balance:
        from fft_restoration_tpu.oracle.color import (
            apply_white_balance,
            bgr_to_lab,
            lab_to_bgr,
        )

        orig = img.astype(np.float32) / np.float32(255.0)
        merged = lab_to_bgr(
            apply_white_balance(bgr_to_lab(merged), bgr_to_lab(orig))
        )
    return np.clip(merged * 255.0, 0.0, 255.0).astype(np.uint8)
