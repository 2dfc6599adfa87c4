"""Engine lifecycle + per-image pipeline orchestration.

Mirrors the reference's three public entry points and its artifact contract:

* ``initialize_engine(cache_path, log_dir)``  — include/initialize.h:12,
  impl src/initialize.cpp:26-76.  Loads the model checkpoint (the TensorRT
  plan-file analog), opens the truncate-on-init log, configures the JAX
  persistent compilation cache, and **AOT-compiles** the full fused inference
  program — warm-up + CUDA-Graph capture (src/process.cpp:92-105) collapse
  into one `jit(...).lower().compile()`.
* ``process_single_image(path, w, h, out_dir)`` — include/process.h:29,
  impl src/process.cpp:188-262.  Same five artifacts with the same names:
  ``{base}_normalized.png``, ``{base}_original_sizes.json``,
  ``{base}_mask.png``, ``{base}_contour_overlay.png``, ``{base}.json``.
* ``cleanup_resources()`` — include/cleanup.h:7, impl src/cleanup.cpp:10-64.

Where the reference stages communicate through files re-read from disk
(src/process.cpp:207-217), we pass arrays in memory — the PNG round-trips are
lossless so the artifacts are still written byte-for-byte, but the hot path
never touches the filesystem twice.

The whole dense pipeline (normalize -> UNet -> argmax -> hole fill -> open ->
component filter) is ONE XLA executable per batch shape: XLA's whole-program
launch is the CUDA-Graph analog, and donated input buffers are the
preallocated-device-buffer analog (src/process.cpp:74-87).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unetseg_tpu import checkpoint
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.io import native, png, raw as raw_io
from unetseg_tpu.models import registry as model_registry
from unetseg_tpu.ops import decode, preprocess
from unetseg_tpu.utils.logger import GLOBAL_LOG, derive_log_dir

TARGET = 512


class InferenceEngine:
    """Holds params on device + compiled executables per batch size.

    The analog of TensorRTContext (include/process.h:13-26): instead of
    (IExecutionContext, stream, device buffers, cudaGraphExec), we keep the
    device-resident param pytree and a cache of AOT-compiled XLA programs.
    """

    def __init__(self, params, cfg: ModelConfig,
                 device_postprocess: bool = False,
                 devices: Optional[List] = None):
        self.cfg = cfg
        self.size = cfg.image_size  # reference hard-codes 512 (process.cpp:70)
        # All-device serving mode: fuse the mask cleanup (hole fill / open /
        # CC area filter, ops/postprocess.py with the Pallas segmented-scan
        # CCL on TPU) into the inference executable — for host-poor
        # deployments; the default overlaps the C++ host cleanup instead.
        self.device_postprocess = device_postprocess
        # Multi-chip: when more than one device is visible, batches are
        # sharded over a dp mesh transparently (no CLI flags; the analog
        # surface `process.h:29` stays unchanged).  Per-image batch-1 calls
        # and odd batch sizes fall back to single-device executables.
        #
        # ``devices`` pins this engine to a subset of the host's chips so
        # independent engines can serve concurrent callers side by side —
        # the working realization of the reference's thread_local-context
        # intent (src/process.cpp:15), minus its shared-static-buffer race.
        devs = list(devices) if devices is not None else jax.devices()
        self.devices = devs
        if len(devs) > 1:
            from unetseg_tpu.parallel import mesh as pmesh

            self.mesh = pmesh.make_mesh(len(devs), devices=devs)
            self.params = jax.device_put(params, pmesh.replicated(self.mesh))
        else:
            self.mesh = None
            self.params = jax.device_put(params, devs[0])
        self._device = devs[0]
        # AOT executables keyed by batch size, plus jitted TTA/tiled variants
        # keyed by ("tta"|"tiled", shape, ...) tuples.
        self._compiled: Dict[object, object] = {}

    # -- the fused dense pipeline ------------------------------------------
    def _pipeline(self, params, u8_batch):
        """(N, S, S) uint8 -> argmax class masks, one XLA program.

        Normalize -> UNet -> argmax decode fuse into a single executable.
        The mask *cleanup* (hole fill / open / CC filter) runs on the host
        (io/native.postprocess_batch): it is pointer-chasing work the
        reference also does host-side, C++ union-find does it in
        microseconds, and TPU scatters would serialize it — the device twin
        (ops/postprocess.py) exists and is oracle-verified, but the engine
        overlaps host cleanup with the next batch's device work instead.
        """
        _, mask = self._mask_from_u8(params, u8_batch, need_logits=False)
        return self._maybe_device_post(mask)

    def _logits_and_mask(self, params, u8_batch, cfg=None):
        """normalize -> apply -> decode for (params, cfg); the single copy
        of the body the serving/cascade/fallback pipelines previously each
        duplicated (round-4 review finding)."""
        cfg = cfg or self.cfg
        x = preprocess.model_input_from_u8(u8_batch)[..., None]
        logits = model_registry.apply(params, x, cfg)
        return logits, decode.decode_mask(logits, cfg.num_classes)

    def _mask_from_u8(self, params, u8_batch, need_logits: bool):
        """Primary-student forward.  ``need_logits`` is kept in the
        signature for the margin routers; the mask-only fused mega-kernel
        opt-in it used to gate was pruned in round 5 (measured slower than
        the XLA default — memo in docs/PERFORMANCE.md round-2 section)."""
        del need_logits
        return self._logits_and_mask(params, u8_batch)

    def _maybe_device_post(self, mask):
        if self.device_postprocess:
            from unetseg_tpu.ops import postprocess as device_post

            on_tpu = jax.devices()[0].platform == "tpu"
            mask = device_post.postprocess_masks(mask, use_pallas_cc=on_tpu)
        return mask

    def _put(self, arr) -> jax.Array:
        """Host array -> this engine's device (or default for mesh engines:
        sharded entry points do their own placement)."""
        if self.mesh is None:
            return jax.device_put(np.asarray(arr), self._device)
        return jnp.asarray(arr)

    def cleanup_masks(self, masks) -> np.ndarray:
        """Mask cleanup stage: identity when it already ran on device."""
        if self.device_postprocess:
            return np.asarray(masks)
        return native.postprocess_batch(np.asarray(masks))

    def _batch_sharding(self, batch_size: int):
        """NamedSharding for a batch, or None for the single-device path."""
        if self.mesh is None:
            return None
        n_dp = self.mesh.shape["dp"]
        if batch_size % n_dp != 0:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P("dp"))

    def compile(self, batch_size: int) -> jax.stages.Compiled:
        """AOT compile for a batch size (warm-up + graph capture analog).

        On a multi-device host the executable is SPMD over the dp mesh
        (batch rows split across chips; the per-image pipeline needs no
        collectives, so scaling is linear over ICI-local chips).
        """
        if batch_size not in self._compiled:
            bs = self._batch_sharding(batch_size)
            if bs is not None:
                from unetseg_tpu.parallel import mesh as pmesh

                fn = jax.jit(
                    self._pipeline,
                    in_shardings=(pmesh.replicated(self.mesh), bs),
                    out_shardings=bs,
                    donate_argnums=(1,),
                )
                shape = jax.ShapeDtypeStruct(
                    (batch_size, self.size, self.size), jnp.uint8
                )
            else:
                fn = jax.jit(self._pipeline, donate_argnums=(1,))
                shape = jax.ShapeDtypeStruct(
                    (batch_size, self.size, self.size), jnp.uint8
                )
                if self.mesh is None:
                    # pin the executable to this engine's device so subset
                    # engines compile onto their own chip, not the default
                    from jax.sharding import SingleDeviceSharding

                    shape = jax.ShapeDtypeStruct(
                        shape.shape, shape.dtype,
                        sharding=SingleDeviceSharding(self._device),
                    )
            self._compiled[batch_size] = fn.lower(self.params, shape).compile()
        return self._compiled[batch_size]

    def infer(self, u8_batch: np.ndarray) -> jax.Array:
        """Run the fused program; returns device array (async dispatch)."""
        n = u8_batch.shape[0]
        compiled = self.compile(n)
        bs = self._batch_sharding(n)
        if bs is not None:  # host -> per-chip shards directly, no bounce
            u8 = jax.device_put(np.asarray(u8_batch), bs)
        else:
            u8 = self._put(u8_batch)
        return compiled(self.params, u8)

    # -- confidence-cascade serving ----------------------------------------
    def attach_cascade(self, params, cfg: ModelConfig,
                       threshold: float = 1.5, router: str = "margin",
                       co_params=None, co_cfg: Optional[ModelConfig] = None,
                       margin_threshold: float = 1.5) -> None:
        """Register a stronger fallback model for suspect slices.

        The compact serving student's residual tail is boundary-precision on
        hard shapes (concave rims — benchmarks/RESULTS_r4.md §7).
        ``infer_cascade`` re-runs routed slices through the fallback
        (typically the flagship teacher).  Two routers, both validated on
        the chip (benchmarks/exp_cascade.py / exp_disagree.py):

        * ``router="margin"`` — the student's own top1−top2 logit margin
          over the predicted boundary band (ops/confidence.py); routes
          slices whose margin < ``threshold``.  Catches uncertainty-type
          tails (illumination ρ=+0.77) but provably NOT confidently-wrong
          ones (crescent ρ=−0.38).
        * ``router="disagree"`` — pixel disagreement against a co-model
          (``co_params``/``co_cfg``, e.g. the wide-family robust student:
          same 3.7 MB geometry, different training mixture); routes slices
          with more than ``threshold`` disagreeing pixels.  Costs one extra
          student pass but catches confidently-wrong slices (pooled
          ρ=−0.76 pre-tie-correction — see the RESULTS_r4.md §9 note; the
          worst slice ranks 5/96 by disagreement, a rank-order result the
          estimator change does not move).
        * ``router="both"`` — the union: route when the margin falls below
          ``margin_threshold`` OR the disagreement exceeds ``threshold``
          pixels.  The two signals are measured complementary (margin:
          illumination-type uncertainty, ρ=+0.77 there; disagreement:
          concave capacity failures) at the disagree router's cost — the
          margin adds ~5% on top of the second pass (measured: plain
          16.8 ms/128, disagree +92.5%, both +101.8% —
          benchmarks/exp_cascade_cost.py).

        The reference has no analog — its tail lives inside the opaque
        .trt artifact — but cascade routing is the standard production
        mitigation for a distilled model's worst case.
        """
        if router not in ("margin", "disagree", "both"):
            raise ValueError(f"router must be 'margin', 'disagree' or "
                             f"'both', got {router!r}")
        if router in ("disagree", "both") and co_params is None:
            raise ValueError(f"router={router!r} needs co_params/co_cfg")

        def _place(tree):
            # match the engine's own param placement (mesh-replicated on
            # multi-device engines) so the fused router program sees
            # consistently-placed operands
            if self.mesh is not None:
                from unetseg_tpu.parallel import mesh as pmesh

                return jax.device_put(tree, pmesh.replicated(self.mesh))
            return jax.device_put(tree, self._device)

        self._cascade_params = _place(params)
        self._cascade_cfg = cfg
        self.cascade_threshold = float(threshold)
        self.cascade_margin_threshold = float(margin_threshold)
        self.cascade_router = router
        if co_params is not None:
            self._cascade_co_params = _place(co_params)
            self._cascade_co_cfg = co_cfg

    def _pipeline_conf(self, params, u8_batch):
        """_pipeline + per-slice boundary-margin confidence (one program)."""
        from unetseg_tpu.ops import confidence

        logits, mask = self._logits_and_mask(params, u8_batch)
        conf = confidence.boundary_margin(logits, mask)
        return self._maybe_device_post(mask), conf

    def _disagreement(self, mask, co_params, u8_batch):
        """Pixel-disagreement count vs the co-model, per slice."""
        _, co_mask = self._logits_and_mask(co_params, u8_batch,
                                           cfg=self._cascade_co_cfg)
        return jnp.sum((mask != co_mask).reshape(mask.shape[0], -1),
                       axis=1).astype(jnp.float32)

    def _pipeline_disagree(self, params, co_params, u8_batch):
        """_pipeline + per-slice pixel disagreement vs the co-model.

        Both students run in ONE XLA program; the router statistic is the
        count of pixels where their argmax masks differ.  The co-model's
        mask is only a signal — the emitted mask is the primary student's.
        """
        _, mask = self._mask_from_u8(params, u8_batch, need_logits=False)
        d = self._disagreement(mask, co_params, u8_batch)
        return self._maybe_device_post(mask), d

    def _pipeline_both(self, params, co_params, u8_batch):
        """_pipeline + BOTH router statistics in one XLA program.

        The margin comes free once the primary logits exist (a handful of
        elementwise compares, ops/confidence.py); the disagreement costs
        the co-model pass it always costs.  Returns (mask, margin,
        disagree_count) so the host can take the union.
        """
        from unetseg_tpu.ops import confidence

        logits, mask = self._logits_and_mask(params, u8_batch)
        margin = confidence.boundary_margin(logits, mask)
        d = self._disagreement(mask, co_params, u8_batch)
        return self._maybe_device_post(mask), margin, d

    def _cascade_fallback(self, bucket: int):
        """AOT fallback-model executable for a padded subset batch."""
        key = ("cascade", bucket)
        if key not in self._compiled:
            cfg = self._cascade_cfg

            def fb(params, u8_batch):
                _, mask = self._logits_and_mask(params, u8_batch, cfg=cfg)
                return self._maybe_device_post(mask)

            shape = jax.ShapeDtypeStruct((bucket, self.size, self.size),
                                         jnp.uint8)
            self._compiled[key] = jax.jit(fb).lower(
                self._cascade_params, shape).compile()
        return self._compiled[key]

    def _cascade_router_exec(self, n: int):
        """AOT executable of the fused student+router program for batch n."""
        shape = jax.ShapeDtypeStruct((n, self.size, self.size), jnp.uint8)
        if self.cascade_router == "disagree":
            key = ("disagree", n)
            if key not in self._compiled:
                self._compiled[key] = jax.jit(self._pipeline_disagree).lower(
                    self.params, self._cascade_co_params, shape).compile()
        elif self.cascade_router == "both":
            key = ("both", n)
            if key not in self._compiled:
                self._compiled[key] = jax.jit(self._pipeline_both).lower(
                    self.params, self._cascade_co_params, shape).compile()
        else:
            key = ("conf", n)
            if key not in self._compiled:
                self._compiled[key] = jax.jit(self._pipeline_conf).lower(
                    self.params, shape).compile()
        return self._compiled[key]

    def compile_cascade(self, n: int = 1) -> None:
        """AOT-compile the cascade serving programs for batch n at init time.

        Mirrors :meth:`compile` for the plain path: with a cascade attached
        the hot path is the fused router program plus the fallback bucket,
        and leaving them to lazy first-use compilation would hand the first
        ``process`` request a multi-second (tunneled: ~30 s/program) stall
        the reference's warm-up contract (src/process.cpp:92-105) exists to
        avoid.
        """
        self._cascade_router_exec(n)
        self._cascade_fallback(1)  # the single-image route bucket

    def infer_cascade(self, u8_batch: np.ndarray,
                      n_valid: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Student pass + margin-routed fallback re-runs.

        Returns (masks, confidences, n_routed); masks land on host (the
        routing decision is a host branch, so this path synchronizes).
        ``confidences`` is the router statistic: boundary margin for
        ``router="margin"``, pixel-disagreement count for ``"disagree"``
        and ``"both"`` (the union router's margin term is internal).
        ``n_valid`` restricts ROUTING to the first n rows — padded
        tail-repeat rows otherwise route with their source slice,
        multiplying fallback work and inflating cascade_routed telemetry
        by up to bucket-1 copies (round-4 review finding).
        Requires :meth:`attach_cascade`.
        """
        if getattr(self, "_cascade_params", None) is None:
            raise RuntimeError("attach_cascade first")
        n = u8_batch.shape[0]
        n_valid = n if n_valid is None else min(int(n_valid), n)
        u8 = np.asarray(u8_batch)
        exe = self._cascade_router_exec(n)
        if self.cascade_router == "disagree":
            mask_d, conf_d = exe(
                self.params, self._cascade_co_params, self._put(u8))
            margin_d = None
        elif self.cascade_router == "both":
            mask_d, margin_d, conf_d = exe(
                self.params, self._cascade_co_params, self._put(u8))
        else:
            mask_d, conf_d = exe(self.params, self._put(u8))
            margin_d = None
        # np.array (owned copy): the routed rows are spliced in place below,
        # and np.asarray of a jax.Array is a read-only view.
        masks, conf = np.array(mask_d), np.asarray(conf_d)
        cv = conf[:n_valid]
        if self.cascade_router == "disagree":
            routed = np.nonzero(cv > self.cascade_threshold)[0]
        elif self.cascade_router == "both":
            margin = np.asarray(margin_d)[:n_valid]
            routed = np.nonzero(
                (cv > self.cascade_threshold)
                | (margin < self.cascade_margin_threshold))[0]
        else:
            routed = np.nonzero(cv < self.cascade_threshold)[0]
        if routed.size:
            bucket = 1 << (int(routed.size) - 1).bit_length()
            bucket = min(bucket, n)
            sub = np.empty((bucket, self.size, self.size), np.uint8)
            sub[:routed.size] = u8[routed]
            if bucket > routed.size:  # pad with repeats of the first routed
                sub[routed.size:] = u8[routed[0]]
            fb_masks = np.asarray(self._cascade_fallback(bucket)(
                self._cascade_params, self._put(sub)))
            masks[routed] = fb_masks[:routed.size]
        return masks, conf, int(routed.size)

    def infer_tta(self, u8_2d: np.ndarray) -> jax.Array:
        """8-fold dihedral TTA ensemble on one slice (BASELINE config 5).

        Every float family (unet, attention_unet, unetpp) is served by the
        weight-space formulation (tta.py: equivariance turns the 8 views
        into 8 transformed-weight passes over untransposed activations —
        measured faster and bit-identical masks; per-family equivalence
        pinned in tests/test_parallel.py).  Quantized archs (unet_w8a8)
        keep the registry-dispatched activation-space ensemble — their
        scale tables are not spatial-transform-aware."""
        key = ("tta", u8_2d.shape)
        if key not in self._compiled:
            from unetseg_tpu.parallel import tta

            # Multi-chip engines shard the ensemble over their dp mesh
            # (VERDICT r3 item 3: BASELINE config 5 "across a v5e-8 slice"):
            # the UNet family stacks its 8 weight variants over dp (one
            # variant per chip at dp=8); other archs shard the 8-view batch.
            n_dp = self.mesh.shape["dp"] if self.mesh is not None else 1
            ws_archs = ("unet", "attention_unet", "unetpp")
            if self.cfg.arch in ws_archs and self.mesh is not None \
                    and tta.N_TRANSFORMS % n_dp == 0:
                self._compiled[key] = (
                    "ws", tta.make_tta_weightspace_mesh_pipeline(
                        self.cfg, self.mesh,
                        device_postprocess=self.device_postprocess))
            elif self.cfg.arch in ws_archs:
                self._compiled[key] = ("ws", tta.make_tta_weightspace_pipeline(
                    self.cfg, device_postprocess=self.device_postprocess))
            else:
                mesh = (self.mesh if self.mesh is not None
                        and tta.N_TRANSFORMS % n_dp == 0 else None)
                self._compiled[key] = ("act", tta.make_tta_pipeline(
                    self.cfg, mesh=mesh,
                    device_postprocess=self.device_postprocess))
        kind, fn = self._compiled[key]
        if kind == "ws":
            return fn(self.params, self._put(u8_2d)[None])[0]
        return fn(self.params, self._put(u8_2d))

    def infer_tiled(self, u8_2d: np.ndarray, window: int,
                    overlap: Optional[int] = None) -> jax.Array:
        """Sliding-window inference at native resolution (BASELINE config 3).

        The window is aligned down to a multiple of ``stem * 2**depth`` (the
        UNet's pool/pipeline divisibility requirement — an unaligned window
        breaks the skip-concat shapes); images smaller than one aligned
        window are edge-padded for the pass and the mask cropped back.
        ``overlap=None`` means window/2 of the ALIGNED window — computing
        the default from the user's pre-clamp window could degenerate to
        stride-1 tiling (~20x work) or an irregular grid that misses the
        overlap-add fast blend (round-4 review finding)."""
        h, w = u8_2d.shape
        align = self.cfg.stem * (2 ** self.cfg.depth)
        window = min(window, h, w)   # window larger than the image: one tile
        window = max(align, window - window % align)
        if overlap is None:
            overlap = window // 2
        overlap = min(overlap, window - 1) if window > 1 else 0
        pad_h = max(0, window - h)
        pad_w = max(0, window - w)
        padded = bool(pad_h or pad_w)
        if padded:
            u8_2d = np.pad(np.asarray(u8_2d), ((0, pad_h), (0, pad_w)),
                           mode="edge")
        # When padding applies, the device cleanup must see the CROPPED
        # mask (its 6%-of-image area threshold is size-dependent), so the
        # in-pipeline postprocess is deferred to a crop-then-clean step.
        dev_post = self.device_postprocess and not padded
        key = ("tiled", u8_2d.shape, window, overlap, dev_post)
        if key not in self._compiled:
            from unetseg_tpu.parallel import tiles

            # Multi-chip engines shard the window batch over dp (VERDICT r3
            # item 3: BASELINE config 3, tiles ride ICI to their chips; the
            # Hann blend is a replicated epilogue).  GSPMD pads uneven
            # window counts, so the mesh is passed unconditionally.
            self._compiled[key] = tiles.make_tiled_pipeline(
                self.cfg, window=window, overlap=overlap, mesh=self.mesh,
                device_postprocess=dev_post,
            )
        out = self._compiled[key](self.params, self._put(u8_2d))
        if padded:
            out = out[:h, :w]
            if self.device_postprocess:
                from unetseg_tpu.ops import postprocess as device_post

                on_tpu = jax.devices()[0].platform == "tpu"
                out = device_post.postprocess_mask_jit(
                    out, use_pallas_cc=on_tpu)
        return out


# --------------------------------------------------------------------------
# Global engine state (parity with g_runtime/g_engine, initialize.h:24-25)
# --------------------------------------------------------------------------

_engine: Optional[InferenceEngine] = None


def get_engine() -> Optional[InferenceEngine]:
    return _engine


def initialize_engine(cache_path: str, log_dir: Optional[str] = None,
                      device_postprocess: bool = False,
                      cascade_ckpt: Optional[str] = None,
                      cascade_threshold: float = 1.5,
                      cascade_router: str = "margin",
                      cascade_co_ckpt: Optional[str] = None,
                      cascade_margin_threshold: float = 1.5) -> bool:
    """Load checkpoint, open log, set up compile cache, AOT-compile batch-1.

    ``device_postprocess=True`` fuses the mask cleanup into the device
    executable (all-device serving for host-poor deployments).
    ``cascade_ckpt`` attaches a stronger fallback model; batched processing
    then re-runs routed slices through it.  ``cascade_router="margin"``
    routes on the student's boundary-band margin (< ``cascade_threshold``);
    ``"disagree"`` routes on pixel disagreement (> ``cascade_threshold``
    pixels) against the co-model ``cascade_co_ckpt``; ``"both"`` takes the
    union (disagreement > ``cascade_threshold`` OR margin <
    ``cascade_margin_threshold``) — the two signals catch complementary
    failure types (see InferenceEngine.attach_cascade)."""
    global _engine
    try:
        if log_dir is None:
            log_dir = derive_log_dir(cache_path)
        if not GLOBAL_LOG.open(log_dir):
            # every failure path leaves nothing servable — a failed re-init
            # must not keep the PREVIOUS engine live (round-4 review
            # finding; the later paths already did this)
            _engine = None
            return False
        GLOBAL_LOG.write("=== Initializing Medical Image Segmentation Engine ===")
        GLOBAL_LOG.write(f"Engine Cache: {cache_path}")

        if not os.path.exists(cache_path):
            GLOBAL_LOG.write(f"Error: engine cache file not found - {cache_path}")
            _engine = None
            return False

        # Persistent compilation cache: the .trt plan-file analog — re-inits
        # and re-runs skip XLA compilation entirely.
        try:
            cache_dir = os.path.join(os.path.dirname(cache_path), "jax_cache")
            if jax.config.jax_compilation_cache_dir not in (None, cache_dir):
                # jax latches the first dir at cache init; reset so an engine
                # re-init against a different checkpoint honours ITS cache.
                from jax._src import compilation_cache as _cc

                _cc.reset_cache()
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass  # cache is an optimization, never fatal

        params, cfg = checkpoint.load(cache_path)
        # Build into a LOCAL first: publishing the global before cascade
        # validation/warm-up left a live engine serving WITHOUT the
        # requested cascade after a failed re-init (round-4 review finding).
        # Any failure below leaves _engine = None (the reference's failed
        # init likewise leaves nothing servable).
        eng = InferenceEngine(params, cfg, device_postprocess)
        if cascade_ckpt:
            if not os.path.exists(cascade_ckpt):
                GLOBAL_LOG.write(
                    f"Error: cascade checkpoint not found - {cascade_ckpt}")
                _engine = None
                return False
            fb_params, fb_cfg = checkpoint.load(cascade_ckpt)
            co_params = co_cfg = None
            if cascade_router in ("disagree", "both"):
                if not (cascade_co_ckpt and os.path.exists(cascade_co_ckpt)):
                    GLOBAL_LOG.write(
                        f"Error: {cascade_router} router needs "
                        f"cascade_co_ckpt - {cascade_co_ckpt}")
                    _engine = None
                    return False
                co_params, co_cfg = checkpoint.load(cascade_co_ckpt)
            eng.attach_cascade(fb_params, fb_cfg, cascade_threshold,
                               router=cascade_router,
                               co_params=co_params, co_cfg=co_cfg,
                               margin_threshold=cascade_margin_threshold)
            GLOBAL_LOG.write(
                f"Cascade fallback attached: {cascade_ckpt} "
                f"(router {cascade_router}, threshold {cascade_threshold}"
                + (f", margin_threshold {cascade_margin_threshold}"
                   if cascade_router == "both" else "") + ")")
        t0 = time.perf_counter()
        eng.compile(1)
        if cascade_ckpt:
            # with a cascade attached, process_single_image serves through
            # the fused router program, not the plain batch-1 executable —
            # warm THAT path up too (plus the route bucket) so the first
            # request pays no lazy compile.
            eng.compile_cascade(1)
        compile_ms = int((time.perf_counter() - t0) * 1000)
        _engine = eng

        size = cfg.image_size
        GLOBAL_LOG.write("Engine initialized successfully")
        GLOBAL_LOG.write(f"Context compiled for fixed {size}x{size} input")
        GLOBAL_LOG.write(f"  Input size: {size * size * 4} bytes")
        GLOBAL_LOG.write(
            f"  Output size: {cfg.num_classes * size * size * 4} bytes "
            f"(classes={cfg.num_classes})"
        )
        GLOBAL_LOG.record(event="init", cache=cache_path, compile_ms=compile_ms)
        return True
    except Exception as e:
        print(f"Initialization error: {e}")
        if GLOBAL_LOG.is_open():
            GLOBAL_LOG.write(f"Initialization error: {e}")
        _engine = None  # never leave a half-initialized engine servable
        return False


def make_partitioned_engines(n_partitions: int,
                             device_postprocess: bool = False,
                             ) -> List[InferenceEngine]:
    """Split the host's visible chips into N independent engines.

    The reference INTENDS concurrent ``process_single_image`` callers via
    thread_local TensorRT contexts (``/root/reference/src/process.cpp:14-19``,
    ``include/process.h:13-26``) but breaks them with shared static staging
    buffers.  Here each partition engine owns a disjoint device subset
    (remainder spread round-robin, sizes differing by at most 1), so
    threaded callers pass their partition as ``eng=`` and run truly in
    parallel — the working realization of the thread_local intent:

        engines = engine.make_partitioned_engines(4)
        # thread i:
        engine.process_single_image(path, w, h, out, eng=engines[i])

    Requires a prior :func:`initialize_engine` (supplies params/config).
    The service's ``--partitions N`` pool is built on this.
    """
    base = get_engine()
    if base is None:
        raise RuntimeError("initialize_engine first")
    devs = jax.devices()
    n = max(1, min(int(n_partitions), len(devs)))
    per, extra = divmod(len(devs), n)
    sizes = [per + (1 if i < extra else 0) for i in range(n)]
    bounds = [0]
    for s in sizes:
        bounds.append(bounds[-1] + s)
    engines = [
        InferenceEngine(base.params, base.cfg, device_postprocess,
                        devices=devs[bounds[i]:bounds[i + 1]])
        for i in range(n)
    ]
    if getattr(base, "_cascade_params", None) is not None:
        # the partitions must serve the same policy the operator configured
        # on the base engine — a partitioned service silently dropping the
        # cascade would emit exactly the uncascaded masks the cascade was
        # attached to avoid
        for eng in engines:
            eng.attach_cascade(
                base._cascade_params, base._cascade_cfg,
                base.cascade_threshold, router=base.cascade_router,
                co_params=getattr(base, "_cascade_co_params", None),
                co_cfg=getattr(base, "_cascade_co_cfg", None),
                margin_threshold=base.cascade_margin_threshold)
    return engines


def cleanup_resources() -> None:
    """Ordered teardown, parity with src/cleanup.cpp:10-64."""
    global _engine
    if GLOBAL_LOG.is_open():
        GLOBAL_LOG.write("=== Cleaning up resources ===")
    if _engine is not None:
        _engine._compiled.clear()
        _engine.params = None
        _engine = None
    if GLOBAL_LOG.is_open():
        GLOBAL_LOG.write("Cleanup completed")
    GLOBAL_LOG.close()


# --------------------------------------------------------------------------
# Per-image pipeline (parity with process_single_image, src/process.cpp:188)
# --------------------------------------------------------------------------

def _polygonize(mask_vis: np.ndarray, output_dir: str, base_name: str,
                original_w: int, original_h: int,
                normalized_png_path: str, overlay: bool = True) -> None:
    """Contours -> overlay PNG + scaled labelme JSON.

    Parity with Mask2Polygon::process_single_mask (src/mask2polygon.cpp:134):
    threshold >127, EXTERNAL/SIMPLE contours; empty contours -> warn and skip
    both overlay and JSON; overlay drawn with *unscaled* coords on the
    normalized PNG; JSON points scaled by (orig/scaled) with truncation.
    Like the reference (src/mask2polygon.cpp:219-221), failures here are
    caught and reported without failing the image.  ``overlay=False``
    (reduced artifact tiers) skips the overlay PNG and its normalized-PNG
    read; the contour JSON is always emitted.
    """
    try:
        print(f"Processing Mask: {base_name}.png")
        scaled_h, scaled_w = mask_vis.shape
        print(f"Original Size: {original_w}x{original_h}")
        print(f"Scaled Size: {scaled_w}x{scaled_h}")

        contours = native.extract_contours(mask_vis)
        if not contours:
            print("Warning: No Contours Detected")
            return
        print(f"Extracted {len(contours)} Contours")

        if overlay:
            overlay_path = os.path.join(
                output_dir, base_name + "_contour_overlay.png")
            overlay_img = png.read_png_bgr(normalized_png_path)
            png.draw_contours_overlay(overlay_img, contours)
            png.write_png(overlay_path, overlay_img, compression=None)
            print(f"Overlay Image Saved to: {overlay_path}")

        scale_x = original_w / scaled_w
        scale_y = original_h / scaled_h
        json_bytes = native.contour_json_bytes(
            contours, base_name, original_w, original_h, scale_x, scale_y
        )
        json_path = os.path.join(output_dir, base_name + ".json")
        with open(json_path, "wb") as f:
            f.write(json_bytes)
        print(f"JSON Saved to: {json_path}")
    except Exception as e:
        print(f"Processing Failure: {e}")


def _emit_per_class_json(decoded_mask: np.ndarray, output_dir: str,
                         base_name: str, original_w: int,
                         original_h: int) -> None:
    """``{base}_classes.json``: labelme shapes for EVERY class region
    (label = class id, labelIndex = position in the class list) extracted
    from the decoded pre-cleanup mask — class-1 regions are defined before
    the cleanup maps the mask to {0,2} (src/postprocess.cpp:75-76).
    BASELINE config 2's per-class contour surface."""
    scaled_h, scaled_w = decoded_mask.shape
    per_class = native.contours_per_class(decoded_mask)
    labeled = []
    for idx, (cls, contours) in enumerate(sorted(per_class.items())):
        labeled += [(cls, idx, c) for c in contours]
    payload = native.contour_json_bytes_labeled(
        labeled, base_name, original_w, original_h,
        original_w / scaled_w, original_h / scaled_h)
    with open(os.path.join(output_dir, base_name + "_classes.json"),
              "wb") as f:
        f.write(payload)


def process_single_image(raw_path: str, width: int, height: int,
                         output_dir: str, *, tta: bool = False,
                         window: Optional[int] = None,
                         overlap: Optional[int] = None,
                         per_class: bool = False,
                         eng: Optional[InferenceEngine] = None) -> bool:
    """Per-image pipeline.  ``tta`` enables the 8-fold ensemble; ``window``
    switches to native-resolution sliding-window inference (no 512²
    downsample) with the given window size.  ``overlap`` defaults to
    window/2: a uniform half-window stride takes the overlap-add blend
    fast path (parallel/tiles.py — 2.9x faster than the general blend at
    1024²x8, and more cross-window smoothing than the old 128 default).
    ``per_class`` additionally emits ``{base}_classes.json`` (per-class
    labelme shapes).  ``eng`` overrides the global engine so concurrent
    callers can each own a device-subset engine."""
    try:
        eng = eng or get_engine()
        if eng is None:
            raise RuntimeError("Engine not initialized")
        if per_class and eng.device_postprocess:
            # the fused executable already erased class 1 ({0,2} cleanup);
            # per-class shapes from a cleaned mask would be silently wrong
            raise ValueError(
                "per_class requires the host postprocess path "
                "(initialize with device_postprocess=False)")

        base_name = os.path.splitext(os.path.basename(raw_path))[0]
        GLOBAL_LOG.write(
            f"\n=== Processing Image: {os.path.basename(raw_path)} ==="
        )
        os.makedirs(output_dir, exist_ok=True)

        t_total = time.perf_counter()

        # --- preprocess (bit-exact host path; src/preprocess.cpp:76) ------
        normalized_png = os.path.join(output_dir, base_name + "_normalized.png")
        size_json = os.path.join(output_dir, base_name + "_original_sizes.json")
        mask_png = os.path.join(output_dir, base_name + "_mask.png")

        raw = raw_io.read_raw(raw_path, width, height)
        if window is not None:
            # native-resolution mode: min-max quantize without resampling
            from unetseg_tpu.ops.preprocess import normalize_u8

            u8 = np.asarray(normalize_u8(jnp.asarray(np.asarray(raw))))
            scaled_w, scaled_h = width, height
        else:
            u8 = native.preprocess_u8(np.asarray(raw), eng.size)
            scaled_w = scaled_h = eng.size
        png.write_png(normalized_png, u8, compression=0)
        with open(size_json, "wb") as f:
            f.write(
                native.size_json_bytes(
                    os.path.basename(raw_path), width, height,
                    scaled_w, scaled_h,
                )
            )

        # --- inference (one XLA program) + host mask cleanup ---------------
        t_inf = time.perf_counter()
        if window is not None:
            # overlap=None passes through: infer_tiled owns the window/2
            # default AFTER clamping/alignment
            mask = np.asarray(eng.infer_tiled(u8, window, overlap))
        elif tta:
            mask = np.asarray(eng.infer_tta(u8))
        elif getattr(eng, "_cascade_params", None) is not None:
            mask, _conf, n_routed = eng.infer_cascade(u8[None])
            mask = mask[0]
            if n_routed:
                GLOBAL_LOG.write("Cascade: routed to fallback model")
        else:
            mask = np.asarray(eng.infer(u8[None]))[0]
        inference_ms = int((time.perf_counter() - t_inf) * 1000)
        GLOBAL_LOG.write(f"Inference time: {inference_ms} ms")
        if per_class:
            # per-class regions live in the decoded mask; the cleanup below
            # erases class 1 (maps to {0,2}, src/postprocess.cpp:75-76)
            _emit_per_class_json(mask, output_dir, base_name, width, height)
        mask = eng.cleanup_masks(mask)

        # --- mask artifact (LUT vis; src/process.cpp:178-185,234-239) -----
        vis = decode.mask_to_image_np(mask)  # host LUT: no device dispatch
        png.write_png(mask_png, vis, compression=0)

        # --- polygonize (host native; src/process.cpp:242) ----------------
        _polygonize(vis, output_dir, base_name, width, height, normalized_png)

        total_ms = int((time.perf_counter() - t_total) * 1000)
        GLOBAL_LOG.write(f"Total processing time: {total_ms} ms")
        GLOBAL_LOG.write(f"Processing completed for: {base_name}")
        GLOBAL_LOG.record(
            event="image", file=os.path.basename(raw_path),
            inference_ms=inference_ms, total_ms=total_ms,
        )
        print(f"Total processing time: {total_ms} ms")
        return True
    except Exception as e:
        print(f"Processing error: {e}")
        if GLOBAL_LOG.is_open():
            GLOBAL_LOG.write(f"Processing error: {e}")
        return False


# --------------------------------------------------------------------------
# Batched throughput path (the TPU lever the reference lacks; SURVEY §2 DP)
# --------------------------------------------------------------------------

#: Artifact tiers for batched processing: which of the reference's five
#: per-image artifacts a deployment keeps (measured host cost per slice on
#: one core — full 5.3 ms, mask_json 1.4 ms, json 0.72 ms via the native
#: emitter; benchmarks/RESULTS_r4.md §2).  The contour JSON — the pipeline's
#: actual product — is in every tier.
ARTIFACT_TIERS = ("full", "mask_json", "json")


def process_batch(raw_paths: List[str], width: int, height: int,
                  output_dirs: List[str], batch_size: int = 128,
                  eng: Optional[InferenceEngine] = None,
                  emitter: str = "cv2", tier: str = "full",
                  per_class: bool = False) -> Tuple[int, int]:
    """Batched pipeline over same-sized RAW slices.

    Host loads + device-fused preprocess + batched UNet + postprocess, with
    JAX async dispatch double-buffering device work against host PNG/JSON
    emission.  Returns (success, fail) counts; per-image failures do not
    abort the batch (parity with src/main.cpp:159-163).  The default batch
    of 128 is the measured dispatch-amortization sweet spot for the slim4
    serving geometry (benchmarks/RESULTS_r3.md); smaller directories
    compile their own (persistently cached) tail-size executables.

    ``emitter="native"`` routes artifact writing through the batched C++
    emitter (csrc/emit.cpp, ~6x less host time per slice): PNG pixels and
    JSON bytes identical to the cv2 path; overlay PNG is pixel-identical
    but stored-deflate-encoded rather than cv2's default stream.  The
    default stays "cv2" for byte-level overlay parity with the reference.

    ``tier`` selects the artifact set (ARTIFACT_TIERS): "full" = all five
    reference artifacts; "mask_json" drops the normalized/overlay PNGs;
    "json" keeps only the two JSONs.  Both emitters honor it.

    ``per_class=True`` additionally emits ``{base}_classes.json`` per slice
    (labelme shapes for EVERY class, extracted from the decoded pre-cleanup
    mask — see :func:`_emit_per_class_json`); a per-class emit failure
    marks that slice failed.
    """
    eng = eng or get_engine()
    if eng is None:
        raise RuntimeError("Engine not initialized")
    if tier not in ARTIFACT_TIERS:
        raise ValueError(f"tier must be one of {ARTIFACT_TIERS}, got {tier!r}")
    if per_class and eng.device_postprocess:
        # the fused executable returns CLEANED masks ({0,2}); class-1
        # regions no longer exist, so per-class shapes would be silently
        # wrong rather than merely incomplete
        raise ValueError("per_class requires the host postprocess path "
                         "(initialize with device_postprocess=False)")
    use_native = emitter == "native" and native.emit_slice_available()
    native_tier = {"full": native.TIER_FULL,
                   "mask_json": native.TIER_MASK_JSON,
                   "json": native.TIER_JSON}[tier]

    n_ok = 0
    n_fail = 0
    pending = []  # (device_masks, u8_batch, metas)

    def drain(entry):
        nonlocal n_ok, n_fail
        masks, u8s, metas = entry
        pc_failed = set()
        if per_class:
            # decoded PRE-cleanup masks: class-1 regions exist only here
            dec = np.asarray(masks)
            for k, (path, out_dir) in enumerate(metas):
                try:
                    os.makedirs(out_dir, exist_ok=True)
                    _emit_per_class_json(
                        dec[k], out_dir,
                        os.path.splitext(os.path.basename(path))[0],
                        width, height)
                except Exception as e:
                    print(f"Processing error: {e}")
                    pc_failed.add(k)
        masks = eng.cleanup_masks(masks)
        if use_native:
            dirs = [d for _, d in metas]
            for d in set(dirs):
                os.makedirs(d, exist_ok=True)
            bases = [os.path.splitext(os.path.basename(p))[0]
                     for p, _ in metas]
            counts = native.emit_batch(
                np.asarray(u8s[: len(metas)]),
                np.asarray(masks[: len(metas)]), dirs, bases,
                [os.path.basename(p) for p, _ in metas], width, height,
                native_tier)
            slice_ok = [counts[k] >= 0 and k not in pc_failed
                        for k in range(len(metas))]
            n_ok += sum(slice_ok)
            n_fail += len(metas) - sum(slice_ok)
            return
        for k, (path, out_dir) in enumerate(metas):
            try:
                # a per-class emit failure marks the slice failed but does
                # NOT suppress its regular artifacts — matching the native
                # emitter, whose batched call has already written them
                base = os.path.splitext(os.path.basename(path))[0]
                os.makedirs(out_dir, exist_ok=True)
                normalized_png = os.path.join(out_dir, base + "_normalized.png")
                if tier == "full":
                    png.write_png(normalized_png, u8s[k], compression=0)
                with open(os.path.join(out_dir, base + "_original_sizes.json"), "wb") as f:
                    f.write(native.size_json_bytes(
                        os.path.basename(path), width, height, eng.size, eng.size))
                vis = decode.mask_to_image_np(masks[k])
                if tier in ("full", "mask_json"):
                    png.write_png(os.path.join(out_dir, base + "_mask.png"),
                                  vis, compression=0)
                _polygonize(vis, out_dir, base, width, height, normalized_png,
                            overlay=tier == "full")
                if k in pc_failed:
                    n_fail += 1
                else:
                    n_ok += 1
            except Exception as e:
                print(f"Processing error: {e}")
                n_fail += 1

    def load_chunk(cd):
        # Bit-exact host preprocess (the serial path's C++ resample+quantize,
        # src/preprocess.cpp:76): batch artifacts are byte-identical to
        # process_single_image's, and only u8 crosses to the device (half
        # the H2D bytes, no u8 D2H round-trip).  A ragged tail is padded up
        # to the next power-of-two bucket (last slice repeated; pad rows are
        # dropped at drain) so arbitrary directory sizes compile at most
        # log2(batch_size) executables instead of one per distinct remainder
        # — a cold cache through a tunneled backend pays ~30 s per unique
        # shape (ADVICE r3).  Per-file load failures (truncated RAW,
        # vanished file) drop only that slice — the documented per-image
        # isolation of src/main.cpp:159-163; previously one bad file
        # aborted the whole batch (round-4 review finding).
        chunk, dirs = cd
        u8_list, good, n_bad = [], [], 0
        for p, d in zip(chunk, dirs):
            try:
                u8_list.append(native.preprocess_u8(
                    np.asarray(raw_io.read_raw(p, width, height)), eng.size))
                good.append((p, d))
            except Exception as e:
                print(f"Processing error: {e}")
                n_bad += 1
        if not u8_list:
            return None, good, n_bad
        u8s = np.stack(u8_list)
        n = u8s.shape[0]
        if n < batch_size:
            bucket = 1
            while bucket < n:
                bucket *= 2
            if bucket > n:
                u8s = np.concatenate(
                    [u8s, np.repeat(u8s[-1:], bucket - n, axis=0)])
        return u8s, good, n_bad

    chunks = [
        (raw_paths[i: i + batch_size], output_dirs[i: i + batch_size])
        for i in range(0, len(raw_paths), batch_size)
    ]
    from concurrent.futures import ThreadPoolExecutor

    from unetseg_tpu.parallel.pipeline import prefetch_map

    with ThreadPoolExecutor(max_workers=2) as loaders:
        # Prefetch at most 2 chunks ahead of the device consumer (shared
        # bounded-prefetch orchestration; peak host memory O(batch)).
        for _cd, (u8s, good, n_bad) in prefetch_map(
                loaders, load_chunk, chunks, 2):
            n_fail += n_bad
            if u8s is None:  # every file in this chunk failed to load
                continue
            t_inf = time.perf_counter()
            if getattr(eng, "_cascade_params", None) is not None:
                # Cascade serving: margin-routed fallback re-runs.  This
                # path synchronizes per batch (the routing decision is a
                # host branch), trading the async overlap for the stronger
                # model's worst-slice floor.
                masks, _conf, n_routed = eng.infer_cascade(
                    u8s, n_valid=len(good))
                GLOBAL_LOG.record(
                    event="batch", n=len(good), cascade_routed=n_routed,
                    dispatch_ms=round((time.perf_counter() - t_inf) * 1e3, 3),
                )
            else:
                masks = eng.infer(u8s)  # async dispatch overlaps host drain
                GLOBAL_LOG.record(
                    event="batch", n=len(good),
                    dispatch_ms=round((time.perf_counter() - t_inf) * 1e3, 3),
                )
            pending.append((masks, u8s, good))
            # double buffering: drain the previous batch while this one runs
            if len(pending) > 1:
                drain(pending.pop(0))
        while pending:
            drain(pending.pop(0))
    return n_ok, n_fail
