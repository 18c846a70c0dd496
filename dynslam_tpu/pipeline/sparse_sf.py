"""Sparse scene-flow provider: the reference's `SparseSFProvider` contract
(SparseSFProvider.h:61-78) backed by the TPU feature/matching/egomotion
kernels instead of libviso2.

Stateful like `VisoSparseSFProvider` (which keeps the previous frame inside
libviso2, VisoSparseSFProvider.h:30-32): `compute_sparse_sf` consumes the
current stereo pair, matches against the retained previous frame, and
estimates egomotion; `extract_motion` re-runs the RANSAC estimator on a
masked flow subset for per-object motion (Track.cpp:167-209 call site).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynslam_tpu.config import StereoCalibration, VisualOdometryParams
from dynslam_tpu.ops import egomotion as ego_ops
from dynslam_tpu.ops import features as feat_ops


class SparseSceneFlow:
    """Result bundle: RawFlow rows (N, 8) + validity mask."""

    def __init__(self, flow: np.ndarray, valid: np.ndarray):
        self.flow = flow
        self.valid = valid

    @property
    def matches(self) -> np.ndarray:
        """Valid RawFlow rows only, (M, 8) — for host-side per-object
        masking (variable length is fine on host)."""
        return self.flow[self.valid]


class SparseSFProvider:
    def __init__(
        self,
        intrinsics_vec,  # (fx, cu, cv)
        calib: StereoCalibration,
        params: Optional[VisualOdometryParams] = None,
        seed: int = 0,
    ):
        fx, cu, cv = intrinsics_vec
        self.params = params or VisualOdometryParams()
        self.calib_vec = jnp.asarray([fx, cu, cv, calib.baseline_m], jnp.float32)
        self._prev_feats = None
        self._latest_flow: Optional[SparseSceneFlow] = None
        self._latest_motion: Optional[np.ndarray] = None
        self._latest_motion_tr: Optional[np.ndarray] = None
        self._frame_counter = 0
        self._base_key = jax.random.PRNGKey(seed)

    # -- SparseSFProvider API (SparseSFProvider.h:61-78) -----------------
    def compute_sparse_sf(self, left_gray: np.ndarray, right_gray: np.ndarray):
        """Process the current stereo pair; requires uint8/float gray."""
        lg = jnp.asarray(left_gray, jnp.float32)
        rg = jnp.asarray(right_gray, jnp.float32)
        cur_l, cur_r = feat_ops.detect_features_pair(lg, rg, self.params)

        if self._prev_feats is not None:
            prev_l, prev_r = self._prev_feats
            prev_lg, prev_rg = self._prev_gray
            flow, valid = feat_ops.circular_match(
                cur_l, cur_r, prev_l, prev_r, self.params
            )
            # consistent-reference subpixel refinement of all 4 coords.
            # Valid matches are COMPACTED first (typically ~25-50% of the
            # candidate slots survive the circular check) so the LK
            # gathers only touch real matches; overflow past refine_cap
            # keeps integer precision and is dropped from `valid`.
            N = flow.shape[0]
            cap = min(self.params.refine_cap, N)
            if cap < N:
                (ridx,) = jnp.nonzero(valid, size=cap, fill_value=N)
                r_ok = ridx < N
                ridx_c = jnp.clip(ridx, 0, N - 1)
                refined = feat_ops.refine_flow_quad(
                    lg, rg, prev_lg, prev_rg, flow[ridx_c]
                )
                flow = flow.at[jnp.where(r_ok, ridx, N)].set(
                    refined, mode="drop"
                )
                # matches beyond the cap stay integer-precision: drop them
                n_valid_rank = jnp.cumsum(valid.astype(jnp.int32))
                valid = valid & (n_valid_rank <= cap)
            else:
                flow = jnp.where(
                    valid[:, None],
                    feat_ops.refine_flow_quad(lg, rg, prev_lg, prev_rg, flow),
                    flow,
                )
            key = jax.random.fold_in(self._base_key, self._frame_counter)
            est = ego_ops.estimate_motion(
                flow, valid, self.calib_vec, key,
                jnp.zeros(6, jnp.float32), self.params,
            )
            # keep everything on device; host syncs are deferred to the
            # accessors. On estimation failure, HOLD the last successful
            # motion (libviso2's getMotion keeps returning the last
            # computed Tr_delta, so the reference's pose chain effectively
            # coasts on constant velocity too) — selected on device, no sync
            if getattr(self, "_held_motion", None) is None:
                self._held_motion = jnp.eye(4, dtype=jnp.float32)
            self._held_motion = jnp.where(
                est.success, est.matrix, self._held_motion
            )
            self._latest_flow_dev = (flow, valid)
            self._latest_flow = None
            self._latest_est = est
        self._prev_feats = (cur_l, cur_r)
        self._prev_gray = (lg, rg)
        self._frame_counter += 1

    def flow_available(self) -> bool:
        return getattr(self, "_latest_flow_dev", None) is not None

    def get_flow(self) -> SparseSceneFlow:
        """Host view of the latest flow (syncs on first access per frame)."""
        if self._latest_flow is None:
            flow, valid = self._latest_flow_dev
            self._latest_flow = SparseSceneFlow(
                np.asarray(flow), np.asarray(valid)
            )
        return self._latest_flow

    def get_latest_motion(self) -> np.ndarray:
        """4x4 T_cur<-prev; the last successful estimate when the current
        frame failed (libviso2 getMotion semantics). Syncs."""
        if getattr(self, "_held_motion", None) is None:
            return np.eye(4)
        return np.asarray(self._held_motion)

    def get_latest_motion_device(self):
        """Device-resident 4x4 delta — lets the pose chain stay on the
        accelerator (no host round trip in the hot loop)."""
        if getattr(self, "_held_motion", None) is None:
            return jnp.eye(4, dtype=jnp.float32)
        return self._held_motion

    def motion_available(self) -> bool:
        return getattr(self, "_latest_est", None) is not None and bool(
            self._latest_est.success
        )

    def extract_motion(
        self, masked_flow: np.ndarray, initial_estimate=None,
        irls_rounds: Optional[int] = None,
        gn_iters: Optional[int] = None,
    ) -> Optional[np.ndarray]:
        """Estimate a 6-dof twist from a masked flow subset (object motion).
        Returns the viso2-style twist (6,) or None on failure — mirrors
        `ExtractMotion` returning an empty vector
        (VisoSparseSFProvider.cpp:70-82). `irls_rounds` / `gn_iters`
        override the camera estimator's refinement depth (object motion
        uses TrackerParams.object_irls_rounds / object_gn_iters)."""
        n = len(masked_flow)
        if n < 6:
            return None
        params = self.params
        overrides = {}
        if irls_rounds is not None and irls_rounds != params.irls_rounds:
            overrides["irls_rounds"] = irls_rounds
        if gn_iters is not None and gn_iters != params.gn_iters:
            overrides["gn_iters"] = gn_iters
        if overrides:
            import dataclasses

            params = dataclasses.replace(params, **overrides)
        N = params.max_matches
        flow_pad = np.zeros((N, 8), np.float32)
        take = min(n, N)
        flow_pad[:take] = masked_flow[:take]
        valid = np.zeros(N, bool)
        valid[:take] = True
        init = (
            jnp.asarray(initial_estimate, jnp.float32)
            if initial_estimate is not None
            else jnp.zeros(6, jnp.float32)
        )
        key = jax.random.fold_in(self._base_key, 10_000_019 + self._frame_counter)
        est = ego_ops.estimate_motion(
            jnp.asarray(flow_pad), jnp.asarray(valid), self.calib_vec, key,
            init, params,
        )
        if not bool(est.success):
            return None
        return np.asarray(est.tr)
