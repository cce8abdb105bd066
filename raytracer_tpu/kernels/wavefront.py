"""Sorted-wavefront bounce rounds on the Pallas per-tile traversal.

The TPU-native answer to bounce-ray divergence. The reference's megakernel
lets each GPU thread bounce independently (``compute_dynamic_ray.comp:179``);
the XLA megakernel (kernels/packet.py) emulates that with lockstep masking
and pays HBM-gather rates for every node fetch. Here each bounce is a
*round*:

  1. sort rays by a u32 key (default: 6-way position+direction bit
     interleave — see sort_key; argsort 0.11 ms + 16-col permute ~0.7 ms
     at 184k rays, exp9). Sorting buys two things at once: spatially-and-
     directionally coherent tiles for the per-tile union walk, and dead
     rays packed at the tail so whole-dead tiles exit the Pallas grid in
     one step.
  2. traverse + shade:
     * fused (default when the scene carries the wide-BVH table): ONE
       Pallas call per round — kernels/pallas_mega.bounce_round, the
       bounce megakernel capped at a single bounce. The ray state makes
       one HBM round trip per round instead of one per shade fusion,
       retiring the per-round XLA fusion overhead (~31 ms/frame at 720p,
       round-2 device trace) while keeping the sort/compaction that the
       full-chain megakernel lacks (RAYTPU_BOUNCE=pmega re-walks dying
       tiles — 2.75 vs 6.11 FPS, exp20).
     * split (RAYTPU_WAVE=split, or scenes without nodes4): traverse with
       kernels/pallas_trace, then shade in XLA (kernels/tracer.shade).

Because the sort is also a compaction, level shrinking is a *static slice*:
once the live count fits in half the width, the next round's sort leaves
every live ray in the first half; the dead tail deposits its colors and is
dropped. (The cumsum machinery of the XLA megakernel disappears.)

Per-ray RNG streams are carried state, so reordering changes nothing;
results match kernels/tracer.render_linear to float precision.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from raytracer_tpu.core.fast_types import FastScene
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.pallas_trace import (BLOCK_LANES,
                                                BOUNCE_SUBLANES,
                                                pallas_traverse)
from raytracer_tpu.kernels.tracer import shade

# Bounce rounds use their own tile size: sorted bounce rays measured
# fastest at 16-sublane (2048-ray) tiles (sublanes sweep, PERF_NOTES.md).
BBLOCK = BOUNCE_SUBLANES * BLOCK_LANES

# Narrowest sorted-round width: 4 Pallas tiles by default. Below this the
# per-round fixed costs (sort + dispatch) beat any coherence gain.
# RAYTPU_WAVE_MINW overrides for A/B (rounded up to a whole tile).
MIN_WIDTH = max(1, -(-int(os.environ.get("RAYTPU_WAVE_MINW",
                                         str(4 * BBLOCK))) // BBLOCK)) * BBLOCK

# Bounces per fused round (sort once, then walk+shade this many bounce
# iterations inside the Pallas kernel). >1 trades sort/dispatch fixed
# costs against coherence decay and dying-tile re-walks; the full-chain
# extreme (RAYTPU_BOUNCE=pmega) measured 2.75 vs 6.11 FPS, so the
# productive range, if any, is small (A/B knob).
WAVE_BCAP = max(1, int(os.environ.get("RAYTPU_WAVE_BCAP", "1")))

# Bounces per fused round in the cross-band deep-round tail
# (wavefront_tail). Deep incoherent rounds are where re-sorting buys the
# least (tile mean direction ~zero, union walk ~whole tree regardless)
# while per-round sort+glue fixed costs bite hardest at narrow widths;
# the in-kernel per-ray budget keeps >1 bit-identical.
TAIL_BCAP = max(1, int(os.environ.get("RAYTPU_TAIL_BCAP", "1")))

# Skip the kernel's near-first push-ordering network for rounds narrower
# than this (static per level). At deep incoherent rounds the tile mean
# direction is ~zero, so the ordering key is noise and the 19 scalar
# comparator swaps per visit buy no pruning. 0 = always ordered.
ORDER_MINW = int(os.environ.get("RAYTPU_ORDER_MINW", "0"))

# Measured defaults (r3 TPU sweep, experiments/r3_sweep.log): the
# no-color carry (fused12) won 6.57 vs 6.00 FPS at 720p flagship and the
# winner-cluster sort key (cid) added ~0.3%+ on top (6.59); pd5/om9 and
# the packed-state glue all measured slower. Env knobs keep every loser
# available for A/B.
WAVE_DEFAULT = "fused12"
KEY_DEFAULT = "cid"

# Wider tiles for deep rounds: an incoherent tile union-walks ~the whole
# tree regardless of tile size, so doubling the tile halves the per-ray
# share of the per-visit scalar cost. DEEP_SUB = sublanes to use for
# levels at or below DEEP_MAXW rays (0 = off); widths are floored to the
# deep grain so every level divides.
DEEP_SUB = int(os.environ.get("RAYTPU_DEEP_SUB", "0"))
DEEP_MAXW = int(os.environ.get("RAYTPU_DEEP_MAXW", "200000"))
_GRAIN = max(BBLOCK, DEEP_SUB * BLOCK_LANES if DEEP_SUB else 0)


def _part1by2(v):
    """Spread the low 10 bits of u32 v to every 3rd bit."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _fields_of(ray_o, ray_d, color, atten):
    """Round-state f32 columns in carried order (color columns only in
    the legacy 15-column layout; the fused12 carry drops them)."""
    return (list(ray_o) + list(ray_d)
            + (list(color) if color is not None else []) + list(atten))


def _pack_sorted(order, f_fields, i_cols):
    """Row-gather the round state by ``order``: all f32 fields as ONE
    [w, nf] stack+take (rows are the gather unit — row-rate limited,
    exp4) and the int columns as one [w, ni]."""
    fpack = jnp.take(jnp.stack(list(f_fields), axis=-1), order, axis=0)
    ipack = jnp.take(jnp.stack(list(i_cols), axis=-1), order, axis=0)
    return fpack, ipack


def _unpack_f(fpack, color_carried):
    """(ray_o, ray_d, color|None, atten) from a [w, 9|12] f32 pack."""
    nc = 3 if color_carried else 0
    ray_o = (fpack[:, 0], fpack[:, 1], fpack[:, 2])
    ray_d = (fpack[:, 3], fpack[:, 4], fpack[:, 5])
    color = ((fpack[:, 6], fpack[:, 7], fpack[:, 8]) if color_carried
             else None)
    atten = (fpack[:, 6 + nc], fpack[:, 7 + nc], fpack[:, 8 + nc])
    return ray_o, ray_d, color, atten


def _pack_sorted_one(order, f_fields, i_cols):
    """ONE [w, nf+ni] i32 row-gather instead of the f/i pair: the r3
    device trace showed gather cost is per-ROW, not per-byte (s32[w,3]
    1.33 ms ~= f32[w,9] 1.39 ms at w=307200), so merging halves the
    per-round gather glue. Assembled in i32 — f32 bits must never ride
    f32 concat/elementwise fusions on TPU (CLAUDE.md denormal/NaN rule);
    bitcasts and gathers preserve bits."""
    ib = jax.lax.bitcast_convert_type
    pack = jnp.stack([ib(c, jnp.int32) for c in f_fields] + list(i_cols),
                     axis=-1)
    return jnp.take(pack, order, axis=0)


def _unpack_one(allpack, color_carried):
    """(ray_o, ray_d, color|None, atten) f32 views of an i32 merged pack
    (columns 0..nf-1); int columns stay the caller's business."""
    ib = jax.lax.bitcast_convert_type
    f = lambda j: ib(allpack[:, j], jnp.float32)
    nc = 3 if color_carried else 0
    ray_o = (f(0), f(1), f(2))
    ray_d = (f(3), f(4), f(5))
    color = (f(6), f(7), f(8)) if color_carried else None
    atten = (f(6 + nc), f(7 + nc), f(8 + nc))
    return ray_o, ray_d, color, atten


# Deposits: how each round's finished colors reach the per-band output.
#   grave — DEFAULT (r3b A/B: flagship 8.58 vs 7.74 FPS, two_humans 4.79
#           vs 4.45, car_1080p 2.75 vs 2.67): no scatters at all — every
#           level appends [n,4] i32 (pix, rgb-bits) rows to a graveyard;
#           ONE argsort(pix) + row gather per band emits colors already
#           in pixel order. Valid only under the dense_pix contract
#           (each pixel id < P occurs at most once per band — true for
#           1-spp band renders); callers that can't promise it (the
#           merged cross-band tail, pmega) fall back to ch scatter-adds.
#   ch    — three 1-D f32[n] scatter-adds per level (legacy default).
#   rows  — ONE [n,3] row scatter-add per level. Plausible-but-WRONG,
#           kept as a measured A/B: the r3 trace showed 1-D scatter-adds
#           at 1.33 ms per channel (row-rate-limited, so rows "should"
#           be 3x cheaper), but the frame A/B regressed ~0.8 FPS under
#           both glue modes — the TPU's sparse path handles 1-D scatters
#           natively (and overlaps them); the [n,3] row scatter does not.
# Read at trace time (like RAYTPU_GLUE) so tests/benches can A/B without
# re-importing; a caller's jit cache must be cold for a change to bite.
def _deposit_mode() -> str:
    return os.environ.get("RAYTPU_DEPOSIT", "grave")


def _dep_init(n):
    if _deposit_mode() == "rows":
        return jnp.zeros((n, 3), jnp.float32)
    return (jnp.zeros((n,), jnp.float32),) * 3


def _dep_add(out, idx, channels):
    if _deposit_mode() == "rows":
        return out.at[idx].add(jnp.stack(list(channels), axis=-1),
                               mode="drop")
    return tuple(o.at[idx].add(c, mode="drop")
                 for o, c in zip(out, channels))


def _dep_channels(out):
    if _deposit_mode() == "rows":
        return out[:, 0], out[:, 1], out[:, 2]
    return out


def _grave_entry(pix, dep):
    """[n,4] i32 graveyard rows: (pixel id, r/g/b color bits). i32
    assembly — f32 bits never ride f32 concat fusions (CLAUDE.md)."""
    ib = jax.lax.bitcast_convert_type
    return jnp.stack([pix] + [ib(d, jnp.int32) for d in dep], axis=-1)


def _grave_colors(grave):
    """One argsort(pix) + row gather turns the per-level graveyard into
    colors in PIXEL order (dense_pix contract: each pix < P appears at
    most once; pad ids repeat but sort past every real pixel)."""
    ib = jax.lax.bitcast_convert_type
    gp = grave[0] if len(grave) == 1 else jnp.concatenate(grave, axis=0)
    g = jnp.take(gp, jnp.argsort(gp[:, 0]), axis=0)
    return (ib(g[:, 1], jnp.float32), ib(g[:, 2], jnp.float32),
            ib(g[:, 3], jnp.float32))


def sort_key(ray_o, ray_d, alive, smin, smax, mode: str = "pd5",
             dead_bit: int = 31):
    """u32 round key; dead rays get the top bit so they sort to the tail.

    ``dead_bit=30`` matches the bounce megakernel's in-kernel key
    emission (kernels/pallas_mega.py): every code mode fits in 30 bits,
    and keeping bit 31 clear lets the fused paths carry keys as i32 with
    plain ascending argsort still packing dead rays at the tail.

    ``pd5`` (default): 6-way bit interleave of position+direction, 5 bits
    per channel — groups rays that are close in *both* origin and
    direction, which is what the per-tile union walk needs (exp8b: the
    8-bit variant measured 283 union iters/live-K vs 322 for
    ``oct_morton``'s octant|morton9).

    smin/smax: per-axis scene bounds (dynamic scalars, the BVH root box).
    """
    dead = (~alive).astype(jnp.uint32) << jnp.uint32(dead_bit)
    if mode == "pd5":
        chans = []
        for ax in range(3):
            span = jnp.maximum(smax[ax] - smin[ax], 1e-6)
            chans.append(jnp.clip((ray_o[ax] - smin[ax]) / span * 31.0,
                                  0.0, 31.0).astype(jnp.uint32))
        for ax in range(3):
            chans.append(jnp.clip((ray_d[ax] + 1.0) * 15.5,
                                  0.0, 31.0).astype(jnp.uint32))
        code = jnp.uint32(0)
        for b in range(5):
            for i, c in enumerate(chans):
                code = code | (((c >> jnp.uint32(b)) & jnp.uint32(1))
                               << jnp.uint32(6 * b + i))
        return dead | code
    # pos: pure position morton, 10 bits/axis — no direction bits at all.
    # Candidate for deep bounces, where directions are near-uniform and
    # pd5's interleaved direction bits fragment spatial tile coherence.
    # oct_morton: octant(3) | morton 9 bits/axis (27).
    # om9 (and the XLA-side round-0/fallback form of "cid"):
    # POSITION-MAJOR — morton9(origin) << 3 | direction octant. exp28 key
    # sweep on flagship bounce-1 tiles: x0.75 union visits / x0.65 leaf
    # visits vs pd5 (cid, the kernel-emitted winner-cluster variant,
    # reaches x0.68 / x0.55). Must stay bit-equal to the in-kernel
    # emission (kernels/pallas_mega.py).
    morton = jnp.uint32(0)
    bits = 10 if mode == "pos" else 9
    q_max = float((1 << bits) - 1)
    for ax in range(3):
        span = jnp.maximum(smax[ax] - smin[ax], 1e-6)
        q = jnp.clip((ray_o[ax] - smin[ax]) / span * q_max,
                     0.0, q_max).astype(jnp.uint32)
        morton = morton | (_part1by2(q) << jnp.uint32(ax))
    if mode == "pos":
        return dead | (morton & jnp.uint32((1 << 30) - 1))
    octant = ((ray_d[0] > 0).astype(jnp.uint32)
              | ((ray_d[1] > 0).astype(jnp.uint32) << 1)
              | ((ray_d[2] > 0).astype(jnp.uint32) << 2))
    morton = morton & jnp.uint32((1 << 27) - 1)
    if mode in ("om9", "cid"):
        return dead | (morton << jnp.uint32(3)) | octant
    return dead | (octant << jnp.uint32(28)) | morton


def _round_widths(p: int):
    """Static level schedule p, ~p/2, ~p/4, ... floored at MIN_WIDTH, every
    width rounded down to a whole number of Pallas blocks (of the deep
    grain too, when RAYTPU_DEEP_SUB widens deep-level tiles)."""
    widths = [p]
    while True:
        nxt = (widths[-1] // 2 // _GRAIN) * _GRAIN
        if nxt < MIN_WIDTH:
            break
        widths.append(nxt)
    return widths


def _level_sub(width: int) -> int:
    """Static per-level tile sublanes: DEEP_SUB for deep (narrow) levels
    when enabled and dividing, BOUNCE_SUBLANES otherwise."""
    if (DEEP_SUB and width <= DEEP_MAXW
            and width % (DEEP_SUB * BLOCK_LANES) == 0):
        return DEEP_SUB
    return BOUNCE_SUBLANES


def wavefront_bounces(scene: FastScene, ray_o, ray_d, color, atten, seed,
                      alive, sky_on, cfg: RenderConfig,
                      start_bounce: int = 1, pix=None,
                      interpret: bool | None = None,
                      handoff_width: int | None = None,
                      dense_pix: bool = False):
    """Sorted bounce rounds. State is flat [P] SoA (P multiple of BBLOCK).

    Semantics identical to packet.megakernel_bounces: every ray deposits
    its color at ``pix`` exactly once; returns (cx, cy, cz, rays_traced)
    with colors scatter-summed into a [P] buffer by pixel id.

    ``dense_pix``: promise that ``pix`` restricted to indices < P covers
    each value at most once (band renders at 1 spp: pix is a pixel
    permutation, pads share one id). Deposits then skip scatter-adds
    entirely — every shrink's dead tail is appended to a graveyard and
    ONE argsort(pix) + row gather per band emits the colors already in
    pixel order (the r3 trace showed the per-level scatter-add chains at
    ~15 ms/frame, the largest glue item after the shrink rework).
    """
    p = ray_o[0].shape[0]
    if p % BBLOCK:
        raise ValueError(f"ray count {p} not a multiple of {BBLOCK}")
    if pix is None:
        pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0).reshape(p)

    smin = tuple(scene.nodes8[0, ax] for ax in range(3))
    smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
    key_mode = os.environ.get("RAYTPU_SORT_KEY", KEY_DEFAULT)
    # Fused trace+shade rounds need the wide-BVH table. RAYTPU_WAVE:
    #   fused12 (default) — fused rounds with the no-color carry (below),
    #   fused            — flat-SoA fused rounds: per-round glue is a
    #                      stack + row-gather + per-field unpack (~38 ms
    #                      of the 130 ms 720p frame),
    #   fused_packed     — A/B: state as two packed arrays with one
    #                      gather each. REGRESSED at frame level (5.4 vs
    #                      7.0 FPS): the [13,w] axis-1 gather is a
    #                      minor-dim stride XLA:TPU fuses badly (+42 ms
    #                      of fusions/frame, traced r3) even though the
    #                      packed kernel itself is at par,
    #   split            — pallas-traverse + XLA-shade rounds.
    wave_env = os.environ.get("RAYTPU_WAVE", WAVE_DEFAULT)
    has4 = getattr(scene, "nodes4", None) is not None
    if has4 and wave_env == "fused_packed":
        return _wavefront_packed(scene, ray_o, ray_d, color, atten, seed,
                                 alive, sky_on, cfg, start_bounce, pix,
                                 smin, smax, key_mode, interpret,
                                 handoff_width=handoff_width)
    fused = has4 and wave_env != "split"
    if handoff_width is not None and not fused:
        raise ValueError("tail handoff requires a fused wavefront path")
    # No-color carry (RAYTPU_WAVE=fused12): a ray's color is written only
    # in the round it dies, so the death deposit rides in the atten
    # columns instead of 3 dedicated ones — 25% less per-round sort
    # traffic, 6 fewer kernel HBM block transfers. Bit-identical deposits
    # (same products, same scatter positions).
    nocolor = fused and wave_env == "fused12"
    if fused:
        from raytracer_tpu.kernels.pallas_mega import (bounce_megakernel,
                                                       bounce_megakernel12)

        num4 = jnp.asarray(scene.num_nodes4, jnp.int32).reshape(1)
        skyf = jnp.asarray(sky_on, jnp.int32).reshape(1)
        bounds = scene.nodes8[0, :6]
        fused_interpret = (jax.default_backend() != "tpu"
                           if interpret is None else interpret)
    if nocolor:
        # Fold dead entrants' colors (their deposits, e.g. bounce-0 sky)
        # into atten; live entrants' colors are necessarily 0.
        atten = tuple(jnp.where(alive, a, c)
                      for a, c in zip(atten, color))
        color = None

    # Graveyard deposits only under the caller's dense-pix promise AND
    # the opt-in knob — the rows-deposit regression taught us never to
    # ship an unmeasured deposit-path change without a frame-level A/B.
    dense_pix = dense_pix and _deposit_mode() == "grave"
    grave = [] if dense_pix else None
    out = None if dense_pix else _dep_init(p)
    rays_traced = jnp.float32(0)
    bounce = jnp.int32(start_bounce)

    # Round keys are CARRIED: for pd5/om9/cid the bounce megakernel emits
    # the next round's key from the advanced state (i32, dead flag at bit
    # 30), so per-round XLA glue never re-reads the six position/
    # direction columns. Other key modes (and the split path) compute
    # the key in XLA after each round instead.
    kernel_key = fused and key_mode in ("pd5", "om9", "cid")

    def _key(ray_o, ray_d, alive):
        if kernel_key:
            return jax.lax.bitcast_convert_type(
                sort_key(ray_o, ray_d, alive, smin, smax, key_mode,
                         dead_bit=30), jnp.int32)
        return sort_key(ray_o, ray_d, alive, smin, smax, key_mode)

    def one_round(ray_o, ray_d, color, atten, seed, alive, pix, rays, key,
                  cap=None, ordered=True, sub=BOUNCE_SUBLANES):
        """Sort (by the carried key) -> (fused pallas trace+shade | pallas
        traverse -> XLA shade). Returns advanced state in sorted order
        plus the live count and next key. ``cap``: bounce iterations
        inside the fused kernel this round (traced scalar, >= 1;
        None -> 1)."""
        order = jnp.argsort(key)
        glue = os.environ.get("RAYTPU_GLUE", "one")
        if glue == "perfield":
            # A/B: fifteen 1-D gathers instead of stack + row-gather +
            # per-field unpack (the pmega-path glue style). Measured
            # TERRIBLE on TPU (3.9 vs 7.2 FPS flagship): 4-byte gather
            # granularity.
            tk = lambda c: jnp.take(c, order)
            ray_o = tuple(tk(c) for c in ray_o)
            ray_d = tuple(tk(c) for c in ray_d)
            color = tuple(tk(c) for c in color)
            atten = tuple(tk(c) for c in atten)
            seed = tk(seed)
            pix = tk(pix)
            alive = tk(alive)
        elif glue == "one":
            # Default (r3): ONE [w,12|15] i32 row-gather instead of the
            # separate f32[w,9|12] + s32[w,3] pair (_pack_sorted_one).
            # Flagship A/B: 7.63 vs 7.36 FPS over glue=pack (both with
            # the merged shrink + ch deposits).
            ib = jax.lax.bitcast_convert_type
            nc = 3 if color is not None else 0
            allpack = _pack_sorted_one(
                order, _fields_of(ray_o, ray_d, color, atten),
                [ib(seed, jnp.int32), pix, alive.astype(jnp.int32)])
            ray_o, ray_d, color, atten = _unpack_one(allpack,
                                                     color is not None)
            seed = ib(allpack[:, 9 + nc], jnp.uint32)
            pix = allpack[:, 10 + nc]
            alive = allpack[:, 11 + nc] > 0
        elif glue == "packT":
            # A/B: same row-gather, but ONE explicit transpose after it so
            # the per-field unpacks are contiguous major-dim row slices
            # instead of 12 strided [w,12][:,j] column reads.
            fpack = jnp.stack(list(ray_o) + list(ray_d) + list(color)
                              + list(atten), axis=-1)       # [w, 12]
            fpt = jnp.take(fpack, order, axis=0).T          # [12, w]
            ipack = jnp.stack(
                [jax.lax.bitcast_convert_type(seed, jnp.int32), pix,
                 alive.astype(jnp.int32)], axis=-1)
            ipt = jnp.take(ipack, order, axis=0).T          # [3, w]
            ray_o = (fpt[0], fpt[1], fpt[2])
            ray_d = (fpt[3], fpt[4], fpt[5])
            color = (fpt[6], fpt[7], fpt[8])
            atten = (fpt[9], fpt[10], fpt[11])
            seed = jax.lax.bitcast_convert_type(ipt[0], jnp.uint32)
            pix = ipt[1]
            alive = ipt[2] > 0
        else:
            fpack, ipack = _pack_sorted(
                order, _fields_of(ray_o, ray_d, color, atten),
                [jax.lax.bitcast_convert_type(seed, jnp.int32), pix,
                 alive.astype(jnp.int32)])
            ray_o, ray_d, color, atten = _unpack_f(fpack,
                                                   color is not None)
            seed = jax.lax.bitcast_convert_type(ipack[:, 0], jnp.uint32)
            pix = ipack[:, 1]
            alive = ipack[:, 2] > 0

        if fused:
            nc = 0 if color is None else 3
            w = ray_o[0].shape[0]
            blocks = tuple(
                c.reshape(-1, BLOCK_LANES)
                for c in (*ray_o, *ray_d,
                          *(color if color is not None else ()),
                          *atten)) + (
                jax.lax.bitcast_convert_type(
                    seed, jnp.int32).reshape(-1, BLOCK_LANES),
                alive.astype(jnp.float32).reshape(-1, BLOCK_LANES),
                # Uniform bounce depth per band: the traced bcap gates,
                # the per-ray budget never does.
                jnp.full((w // BLOCK_LANES, BLOCK_LANES), 1 << 30,
                         jnp.int32))
            cap_arr = (jnp.ones((1,), jnp.int32) if cap is None
                       else jnp.asarray(cap, jnp.int32).reshape(1))
            mk = bounce_megakernel if nc else bounce_megakernel12
            outs = mk(
                scene.nodes4, scene.clusters, num4, blocks, cap_arr,
                skyf, bounds, sub, float(cfg.fuzz),
                bool(cfg.emissive_emits), t_min=float(cfg.t_min),
                t_max=float(cfg.t_max), det_eps=float(cfg.det_eps),
                interpret=fused_interpret, ordered=ordered,
                key_mode=key_mode if kernel_key else "pd5")
            flat = lambda i: outs[i].reshape(w)
            # Per-tile count rows from the kernel: exact for any cap (one
            # count per bounce iteration a lane was live); summing
            # [grid,128] here keeps the while-cond reduction tiny.
            rays = rays + jnp.sum(outs[12 + nc])
            live = jnp.sum(outs[13 + nc])
            ray_o = (flat(0), flat(1), flat(2))
            ray_d = (flat(3), flat(4), flat(5))
            if nc:
                color = (flat(6), flat(7), flat(8))
            atten = (flat(6 + nc), flat(7 + nc), flat(8 + nc))
            seed = jax.lax.bitcast_convert_type(outs[9 + nc], jnp.uint32
                                                ).reshape(w)
            alive = flat(10 + nc) > 0.5
            key = (flat(14 + nc) if kernel_key
                   else _key(ray_o, ray_d, alive))
        else:
            rays = rays + jnp.sum(alive.astype(jnp.float32))
            res = pallas_traverse(scene, ray_o, ray_d, alive, cfg,
                                  interpret=interpret,
                                  sublanes=BOUNCE_SUBLANES)
            ray_o, ray_d, color, atten, seed, alive = shade(
                res, ray_o, ray_d, color, atten, seed, alive, sky_on, cfg)
            live = jnp.sum(alive.astype(jnp.float32))
            key = _key(ray_o, ray_d, alive)
        return (ray_o, ray_d, color, atten, seed, alive, pix, rays, live,
                key)

    widths = _round_widths(p)
    state = (ray_o, ray_d, color, atten, seed, alive, pix)
    key = _key(ray_o, ray_d, alive)
    for li, width in enumerate(widths):
        if handoff_width is not None and width <= handoff_width:
            # Band-tail handoff (kernels/packet.py tail merge): stop the
            # ladder and hand the survivors to the caller as two packed
            # arrays (stacked ONCE here, not per round) with a per-ray
            # bounces-left budget — bands reach the handoff at
            # different depths, so depth must ride with the ray.
            ray_o, ray_d, color, atten, seed, alive, pix = state
            sf = jnp.stack(list(ray_o) + list(ray_d)
                           + (list(color) if color is not None else [])
                           + list(atten)
                           + [alive.astype(jnp.float32)], axis=0)
            budget = jnp.broadcast_to(cfg.max_bounces - bounce,
                                      (width,)).astype(jnp.int32)
            si = jnp.stack([jax.lax.bitcast_convert_type(seed, jnp.int32),
                            pix, budget], axis=0)
            if dense_pix:
                # Survivors deposit later via the merged tail; a zero
                # placeholder keeps the graveyard one-row-per-pixel.
                z = jnp.zeros_like(pix)
                grave.append(jnp.stack([pix, z, z, z], axis=-1))
                c0, c1, c2 = _grave_colors(grave)
            else:
                c0, c1, c2 = _dep_channels(out)
            return c0, c1, c2, rays_traced, (sf, si)
        is_last = li == len(widths) - 1
        next_width = None if is_last else widths[li + 1]
        lvl_ordered = ORDER_MINW == 0 or width >= ORDER_MINW
        lvl_sub = _level_sub(width)

        def cond(c):
            b, live = c[1], c[3]
            pending = (b < cfg.max_bounces) & (live > 0)
            if next_width is None:
                return pending
            return pending & (live > next_width)

        def body(c):
            st, b, rays, _, k = c
            if fused and WAVE_BCAP > 1:
                # Multi-bounce fused round: sort once, bounce up to
                # WAVE_BCAP times in-kernel (never past the bounce cap).
                cap = jnp.minimum(jnp.int32(WAVE_BCAP),
                                  cfg.max_bounces - b)
                st = one_round(*st, rays, k, cap, ordered=lvl_ordered,
                               sub=lvl_sub)
                return st[:7], b + cap, st[7], st[8], st[9]
            st = one_round(*st, rays, k, ordered=lvl_ordered, sub=lvl_sub)
            return st[:7], b + 1, st[7], st[8], st[9]

        live0 = jnp.sum(state[5].astype(jnp.float32))
        state, bounce, rays_traced, _, key = jax.lax.while_loop(
            cond, body, (state, bounce, rays_traced, live0, key))

        ray_o, ray_d, color, atten, seed, alive, pix = state
        if is_last:
            # Everyone still aboard deposits. No-color carry: dead rays'
            # atten IS their deposit; alive-at-cap rays end at the bounce
            # cap = kill-to-black (their carried color is necessarily 0
            # in the legacy layout too).
            dep = (color if color is not None else
                   tuple(jnp.where(alive, 0.0, a) for a in atten))
            if dense_pix:
                grave.append(_grave_entry(pix, dep))
            else:
                out = _dep_add(out, pix, dep)
            break

        # Shrink: one more sort packs live rays into the prefix (the while
        # cond guaranteed live <= next_width). The dead tail deposits and
        # is dropped. The carried key rides as the last pack column — a
        # separate 1-D jnp.take(key, order) was the single most expensive
        # glue fusion in the r3 trace (2.2 ms at w=307200, slower than
        # the 9-column row gather), and folding it into the row gather
        # is free.
        ib = jax.lax.bitcast_convert_type
        nc = 3 if color is not None else 0
        order = jnp.argsort(key)
        allpack = _pack_sorted_one(
            order, _fields_of(ray_o, ray_d, color, atten),
            [ib(seed, jnp.int32), pix, alive.astype(jnp.int32),
             key if key.dtype == jnp.int32 else ib(key, jnp.int32)])
        kcol = allpack[:next_width, 12 + nc]
        key = kcol if kernel_key else ib(kcol, jnp.uint32)

        # The tail is final either way: if rounds remain, the while cond
        # guaranteed live <= next_width so every tail ray is dead; if the
        # bounce cap ended the loop, alive-at-cap rays' colors are final
        # too (truncation adds nothing — the reference's kill-to-black).
        # (No-color carry: a dead tail ray's deposit is its atten column,
        # i.e. pack column 6+j either way; alive tail rays deposit black.)
        tail_pix = allpack[next_width:, 10 + nc]
        dep = tuple(ib(allpack[next_width:, 6 + j], jnp.float32)
                    for j in range(3))
        if color is None:
            tail_alive = allpack[next_width:, 11 + nc] > 0
            dep = tuple(jnp.where(tail_alive, 0.0, d) for d in dep)
        if dense_pix:
            grave.append(_grave_entry(tail_pix, dep))
        else:
            out = _dep_add(out, tail_pix, dep)

        ray_o, ray_d, color, atten = _unpack_one(allpack[:next_width],
                                                 color is not None)
        seed = ib(allpack[:next_width, 9 + nc], jnp.uint32)
        pix = allpack[:next_width, 10 + nc]
        alive = allpack[:next_width, 11 + nc] > 0
        state = (ray_o, ray_d, color, atten, seed, alive, pix)

    if dense_pix:
        c0, c1, c2 = _grave_colors(grave)
    else:
        c0, c1, c2 = _dep_channels(out)
    return c0, c1, c2, rays_traced


def _wavefront_packed(scene, ray_o, ray_d, color, atten, seed, alive,
                      sky_on, cfg, start_bounce, pix, smin, smax,
                      key_mode, interpret, handoff_width=None):
    """Packed-state sorted rounds (the default fused engine).

    Semantics identical to the flat-SoA fused path (same kernel core,
    same sort order, bit-identical output — parity-tested); the only
    change is plumbing. Ray state is carried across rounds as two packed
    arrays — sf [13, w] f32 (o3 d3 color3 atten3 alive) and si [2, w]
    i32 (seed bits, pixel id) — so each round's XLA glue collapses to
    key-compute, argsort, and ONE gather per array instead of a
    stack/take/per-field-slice chain (~10 fusions, ~38 ms/frame of the
    round-3 720p device trace, vs ~74 ms in-kernel).

    RAYTPU_PACK_GATHER: ``col`` (default) gathers along axis 1 of the
    field-major arrays; ``row`` transposes, row-gathers, transposes back
    (A/B for XLA:TPU gather-layout behavior).
    """
    from raytracer_tpu.kernels.pallas_mega import (SF_FIELDS, SI_FIELDS,
                                                   bounce_megakernel_packed)

    p = ray_o[0].shape[0]
    gather_mode = os.environ.get("RAYTPU_PACK_GATHER", "col")
    fused_interpret = (jax.default_backend() != "tpu"
                       if interpret is None else interpret)
    num4 = jnp.asarray(scene.num_nodes4, jnp.int32).reshape(1)
    skyf = jnp.asarray(sky_on, jnp.int32).reshape(1)
    bounds = scene.nodes8[0, :6]
    kernel_key = key_mode in ("pd5", "om9", "cid")

    sf = jnp.stack(list(ray_o) + list(ray_d) + list(color) + list(atten)
                   + [alive.astype(jnp.float32)], axis=0)
    si = jnp.stack([jax.lax.bitcast_convert_type(seed, jnp.int32), pix],
                   axis=0)

    def _key(sf):
        k = sort_key((sf[0], sf[1], sf[2]), (sf[3], sf[4], sf[5]),
                     sf[12] > 0.5, smin, smax, key_mode,
                     dead_bit=30 if kernel_key else 31)
        return (jax.lax.bitcast_convert_type(k, jnp.int32)
                if kernel_key else k)

    def sort_state(sf, si, key):
        order = jnp.argsort(key)
        skey = jnp.take(key, order)
        if gather_mode == "row":
            return (jnp.take(sf.T, order, axis=0).T,
                    jnp.take(si.T, order, axis=0).T, skey)
        return (jnp.take(sf, order, axis=1),
                jnp.take(si, order, axis=1), skey)

    def one_round(sf, si, rays, key, cap=None):
        sf, si, _ = sort_state(sf, si, key)
        w = sf.shape[1]
        cap_arr = (jnp.ones((1,), jnp.int32) if cap is None
                   else jnp.asarray(cap, jnp.int32).reshape(1))
        sfo, sio, raysb, liveb, keyb = bounce_megakernel_packed(
            scene.nodes4, scene.clusters, num4,
            sf.reshape(SF_FIELDS, -1, BLOCK_LANES),
            si.reshape(SI_FIELDS, -1, BLOCK_LANES),
            cap_arr, skyf, bounds, BOUNCE_SUBLANES, float(cfg.fuzz),
            bool(cfg.emissive_emits), t_min=float(cfg.t_min),
            t_max=float(cfg.t_max), det_eps=float(cfg.det_eps),
            interpret=fused_interpret,
            key_mode=key_mode if kernel_key else "pd5")
        sfo = sfo.reshape(SF_FIELDS, w)
        key = keyb.reshape(w) if kernel_key else _key(sfo)
        return (sfo, sio.reshape(SI_FIELDS, w),
                rays + jnp.sum(raysb), jnp.sum(liveb), key)

    out = (jnp.zeros((p,), jnp.float32),) * 3
    rays_traced = jnp.float32(0)
    bounce = jnp.int32(start_bounce)
    widths = _round_widths(p)
    state = (sf, si)
    key = _key(sf)
    for li, width in enumerate(widths):
        if handoff_width is not None and width <= handoff_width:
            # Band-tail handoff (kernels/packet.py tail merge): stop the
            # ladder here and hand the survivors — live-sorted prefix of
            # this width, plus a per-ray bounces-left budget row (all
            # rays of a band share the same depth, but merged bands
            # don't) — to the caller for the cross-band deep rounds.
            sf, si = state
            budget = jnp.broadcast_to(cfg.max_bounces - bounce,
                                      (width,)).astype(jnp.int32)
            return (out[0], out[1], out[2], rays_traced,
                    (sf, jnp.concatenate([si, budget[None]], axis=0)))
        is_last = li == len(widths) - 1
        next_width = None if is_last else widths[li + 1]

        def cond(c):
            live, b = c[3], c[1]
            pending = (b < cfg.max_bounces) & (live > 0)
            if next_width is None:
                return pending
            return pending & (live > next_width)

        def body(c):
            (sfc, sic), b, rays, _, k = c
            if WAVE_BCAP > 1:
                cap = jnp.minimum(jnp.int32(WAVE_BCAP),
                                  cfg.max_bounces - b)
                sfc, sic, rays, live, k = one_round(sfc, sic, rays, k, cap)
                return (sfc, sic), b + cap, rays, live, k
            sfc, sic, rays, live, k = one_round(sfc, sic, rays, k)
            return (sfc, sic), b + 1, rays, live, k

        live0 = jnp.sum((state[0][12] > 0.5).astype(jnp.float32))
        state, bounce, rays_traced, _, key = jax.lax.while_loop(
            cond, body, (state, bounce, rays_traced, live0, key))
        sf, si = state
        if is_last:
            # Everyone still aboard deposits (alive-at-cap rays carry any
            # emissive contribution; absorbed rays their accumulated
            # color — the reference's kill-to-black at the bounce cap).
            out = tuple(o.at[si[1]].add(sf[6 + j], mode="drop")
                        for j, o in enumerate(out))
            break

        # Shrink: one more sort packs live rays into the prefix (the
        # while cond guaranteed live <= next_width); the dead tail
        # deposits and is dropped. The carried key already describes the
        # current state.
        sf, si, key = sort_state(sf, si, key)
        key = key[:next_width]
        tail_pix = si[1, next_width:]
        out = tuple(o.at[tail_pix].add(sf[6 + j, next_width:], mode="drop")
                    for j, o in enumerate(out))
        state = (sf[:, :next_width], si[:, :next_width])

    return out[0], out[1], out[2], rays_traced


def wavefront_tail(scene, sf, si, sky_on, cfg, out_size,
                   interpret=None):
    """Cross-band deep-round ladder over merged band survivors.

    Per-band wavefronts hand off their live tails at a fixed width
    (``wavefront_bounces(handoff_width=...)``); the caller concatenates
    them and runs the deep bounces HERE, once per frame instead of once
    per band — 1/nb the per-round fixed costs and a full-frame sort
    radius exactly where ray coherence is worst. Because bands reach the
    handoff at different bounce depths, depth is per-ray: si row 2
    carries bounces-left, decremented per round; a ray dies when it hits
    0 (identical kill rule to the per-band ``b < max_bounces`` cond, so
    output is bit-identical to the unmerged path — each pixel's single
    ray deposits exactly once either way).

    The packed (sf, si) arrays are only the hand-off FORMAT (stackable
    across the band scan); rounds here unpack once and run the same
    flat-SoA glue as the default engine — the packed per-round gather
    regressed 1.3x at frame level (see wavefront_bounces docstring).

    ``si`` rows: seed bits, GLOBAL pixel id (deposits scatter into
    ``[out_size]`` full-frame buffers; pad rays carry id >= out_size and
    drop), bounces-left. Returns (cx, cy, cz, rays_traced).
    """
    from raytracer_tpu.kernels.pallas_mega import (bounce_megakernel,
                                                    bounce_megakernel12)

    p = sf.shape[1]
    smin = tuple(scene.nodes8[0, ax] for ax in range(3))
    smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
    key_mode = os.environ.get("RAYTPU_SORT_KEY", KEY_DEFAULT)
    fused_interpret = (jax.default_backend() != "tpu"
                       if interpret is None else interpret)
    num4 = jnp.asarray(scene.num_nodes4, jnp.int32).reshape(1)
    skyf = jnp.asarray(sky_on, jnp.int32).reshape(1)
    bounds = scene.nodes8[0, :6]
    cap1 = jnp.ones((1,), jnp.int32)
    kernel_key = key_mode in ("pd5", "om9", "cid")

    nocolor = sf.shape[0] == 10  # no-color carry (RAYTPU_WAVE=fused12)
    ray_o = (sf[0], sf[1], sf[2])
    ray_d = (sf[3], sf[4], sf[5])
    if nocolor:
        color = None
        atten = (sf[6], sf[7], sf[8])
        alivef = sf[9] > 0.5
        # A band can hand off at its bounce cap (budget 0): such rays die
        # by exhaustion = kill-to-BLACK, so their atten column (which is
        # the deposit for dead rays) must be zeroed; rays already dead at
        # handoff keep their deposit.
        alive = alivef & (si[2] > 0)
        kill = alivef & ~(si[2] > 0)
        atten = tuple(jnp.where(kill, 0.0, a) for a in atten)
    else:
        color = (sf[6], sf[7], sf[8])
        atten = (sf[9], sf[10], sf[11])
        # A band can hand off at its bounce cap (budget 0): those rays'
        # colors are final — the per-band kill rule must see them dead.
        alive = (sf[12] > 0.5) & (si[2] > 0)
    seed = jax.lax.bitcast_convert_type(si[0], jnp.uint32)
    pix = si[1]
    budget = si[2]

    def _key(ray_o, ray_d, alive):
        if kernel_key:
            return jax.lax.bitcast_convert_type(
                sort_key(ray_o, ray_d, alive, smin, smax, key_mode,
                         dead_bit=30), jnp.int32)
        return sort_key(ray_o, ray_d, alive, smin, smax, key_mode)

    def one_round(ray_o, ray_d, color, atten, seed, alive, pix, budget,
                  rays, key, cap=None, ordered=True, sub=BOUNCE_SUBLANES):
        """Sort (by the carried key) -> fused walk+shade round(s). The
        per-ray bounces-left budget rides INTO the kernel (15th state
        block): the kernel decrements it per iteration a ray enters
        alive and kills the ray at 0, so act/live/key all reflect the
        cross-band kill rule exactly — and multi-bounce tail rounds
        (``cap`` > 1, RAYTPU_TAIL_BCAP) stay bit-identical to 1-bounce
        rounds."""
        order = jnp.argsort(key)
        ib = jax.lax.bitcast_convert_type
        ncc = 3 if color is not None else 0
        allpack = _pack_sorted_one(
            order, _fields_of(ray_o, ray_d, color, atten),
            [ib(seed, jnp.int32), pix, budget, alive.astype(jnp.int32)])
        ray_o, ray_d, color, atten = _unpack_one(allpack,
                                                 color is not None)
        seed = ib(allpack[:, 9 + ncc], jnp.uint32)
        pix = allpack[:, 10 + ncc]
        budget = allpack[:, 11 + ncc]
        entering = allpack[:, 12 + ncc] > 0

        nc = 0 if color is None else 3
        w = ray_o[0].shape[0]
        blocks = tuple(
            c.reshape(-1, BLOCK_LANES)
            for c in (*ray_o, *ray_d,
                      *(color if color is not None else ()),
                      *atten)) + (
            jax.lax.bitcast_convert_type(
                seed, jnp.int32).reshape(-1, BLOCK_LANES),
            entering.astype(jnp.float32).reshape(-1, BLOCK_LANES),
            budget.reshape(-1, BLOCK_LANES))
        cap_arr = (cap1 if cap is None
                   else jnp.asarray(cap, jnp.int32).reshape(1))
        mk = bounce_megakernel if nc else bounce_megakernel12
        outs = mk(
            scene.nodes4, scene.clusters, num4, blocks, cap_arr, skyf,
            bounds, sub, float(cfg.fuzz), bool(cfg.emissive_emits),
            t_min=float(cfg.t_min), t_max=float(cfg.t_max),
            det_eps=float(cfg.det_eps), interpret=fused_interpret,
            ordered=ordered, key_mode=key_mode if kernel_key else "pd5")
        flat = lambda i: outs[i].reshape(w)
        rays = rays + jnp.sum(outs[12 + nc])
        live = jnp.sum(outs[13 + nc])
        ray_o = (flat(0), flat(1), flat(2))
        ray_d = (flat(3), flat(4), flat(5))
        if nc:
            color = (flat(6), flat(7), flat(8))
        atten = (flat(6 + nc), flat(7 + nc), flat(8 + nc))
        seed = jax.lax.bitcast_convert_type(outs[9 + nc],
                                            jnp.uint32).reshape(w)
        alive = flat(10 + nc) > 0.5
        budget = flat(11 + nc)
        key = flat(14 + nc) if kernel_key else _key(ray_o, ray_d, alive)
        return (ray_o, ray_d, color, atten, seed, alive, pix, budget,
                rays, live, key)

    out = _dep_init(out_size)
    rays_traced = jnp.float32(0)
    widths = _round_widths(p)
    state = (ray_o, ray_d, color, atten, seed, alive, pix, budget)
    key = _key(ray_o, ray_d, alive)
    for li, width in enumerate(widths):
        is_last = li == len(widths) - 1
        next_width = None if is_last else widths[li + 1]
        lvl_ordered = ORDER_MINW == 0 or width >= ORDER_MINW
        lvl_sub = _level_sub(width)

        def cond(c):
            live = c[2]
            if next_width is None:
                return live > 0
            return live > next_width

        def body(c):
            st, rays, _, k = c
            st = one_round(*st, rays, k,
                           cap=None if TAIL_BCAP == 1 else TAIL_BCAP,
                           ordered=lvl_ordered, sub=lvl_sub)
            return st[:8], st[8], st[9], st[10]

        live0 = jnp.sum(state[5].astype(jnp.float32))
        state, rays_traced, _, key = jax.lax.while_loop(
            cond, body, (state, rays_traced, live0, key))
        ray_o, ray_d, color, atten, seed, alive, pix, budget = state
        if is_last:
            # No-color carry: live rays' atten is attenuation, not a
            # deposit — they end at the bounce cap = kill-to-black.
            dep = (color if color is not None else
                   tuple(jnp.where(alive, 0.0, a) for a in atten))
            out = _dep_add(out, pix, dep)
            break

        # Shrink: sort packs live rays into the prefix; the dead tail
        # deposits and is dropped. The carried key rides as the last
        # pack column (see wavefront_bounces shrink).
        ib = jax.lax.bitcast_convert_type
        ncc = 3 if color is not None else 0
        order = jnp.argsort(key)
        allpack = _pack_sorted_one(
            order, _fields_of(ray_o, ray_d, color, atten),
            [ib(seed, jnp.int32), pix, budget, alive.astype(jnp.int32),
             key if key.dtype == jnp.int32 else ib(key, jnp.int32)])
        kcol = allpack[:next_width, 13 + ncc]
        key = kcol if kernel_key else ib(kcol, jnp.uint32)
        tail_pix = allpack[next_width:, 10 + ncc]
        dep = tuple(ib(allpack[next_width:, 6 + j], jnp.float32)
                    for j in range(3))
        if color is None:
            tail_alive = allpack[next_width:, 12 + ncc] > 0
            dep = tuple(jnp.where(tail_alive, 0.0, d) for d in dep)
        out = _dep_add(out, tail_pix, dep)
        ray_o, ray_d, color, atten = _unpack_one(allpack[:next_width],
                                                 color is not None)
        seed = ib(allpack[:next_width, 9 + ncc], jnp.uint32)
        pix = allpack[:next_width, 10 + ncc]
        budget = allpack[:next_width, 11 + ncc]
        alive = allpack[:next_width, 12 + ncc] > 0
        state = (ray_o, ray_d, color, atten, seed, alive, pix, budget)

    c0, c1, c2 = _dep_channels(out)
    return c0, c1, c2, rays_traced
