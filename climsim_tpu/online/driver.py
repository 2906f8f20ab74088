"""Hybrid-loop harness: step host columns with emulator tendencies.

The real consumer of the exported wrapper is the E3SM-MMF host model (an
external Fortran/C++ repo; online_testing/README.md section 5).  This module
reproduces the *loop contract* on-device so coupled behavior -- stability,
drift, conservation -- can be tested and benchmarked without E3SM:

  every dt=1200 s:  raw column state -> wrapper -> (B, 368) tendencies
                    -> state += tendency * dt -> derived features refresh
                    (RH, liq_partition, prvphy <- this step's physics,
                    tm_* <- previous step, dyn forcing from a prescribed
                    host-dynamics function)

The whole rollout is one ``lax.scan`` -- the multi-step loop compiles into
a single XLA program, the honest TPU analog of the host model's time loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .. import physics
from ..grid import Grid
from ..varspec import get_varspec


@dataclass(frozen=True)
class ColumnState:
    """Raw per-column prognostic + memory state for the v4 feature set."""

    t: jnp.ndarray       # (B, 60) K
    q1: jnp.ndarray      # (B, 60) specific humidity
    qc: jnp.ndarray      # (B, 60) cloud liquid
    qi: jnp.ndarray      # (B, 60) cloud ice
    u: jnp.ndarray       # (B, 60)
    v: jnp.ndarray       # (B, 60)
    scalars: jnp.ndarray  # (B, S) static surface scalars in v4 tail order
    prvphy: jnp.ndarray   # (B, 5, 60) previous physics tendencies (t,q1,q2,q3,u)
    tm_prvphy: jnp.ndarray  # (B, 5, 60) the step before
    dyn: jnp.ndarray     # (B, 3, 60) current dynamics forcing (t, q0, u)
    tm_dyn: jnp.ndarray  # (B, 3, 60) previous dynamics forcing


def initial_state(x_v4_raw: np.ndarray, grid: Grid | None = None
                  ) -> ColumnState:
    """Build a ColumnState from a raw v4 feature batch (e.g. synthetic)."""
    spec = get_varspec("v4")
    sl = spec.input_slices
    j = jnp.asarray
    prof = lambda n: j(x_v4_raw[:, sl[n]])
    scal_names = [v for v in spec.inputs if spec.input_slices[v].stop -
                  spec.input_slices[v].start == 1]
    # jnp.concatenate keeps device inputs on device (np.concatenate would
    # silently round-trip jax arrays through host memory -- fatal on a
    # slow-D2H tunnel when building large on-device IC pools)
    scalars = jnp.concatenate(
        [j(x_v4_raw[:, sl[n]]) for n in scal_names], axis=1)
    stack = lambda names: jnp.stack([prof(n) for n in names], axis=1)
    return ColumnState(
        t=prof("state_t"), q1=physics_q1_from_rh(x_v4_raw, spec, grid),
        qc=prof("state_q0002"), qi=prof("state_q0003"),
        u=prof("state_u"), v=prof("state_v"),
        scalars=scalars,
        prvphy=stack(["state_t_prvphy", "state_q0001_prvphy",
                      "state_q0002_prvphy", "state_q0003_prvphy",
                      "state_u_prvphy"]),
        tm_prvphy=stack(["tm_state_t_prvphy", "tm_state_q0001_prvphy",
                         "tm_state_q0002_prvphy", "tm_state_q0003_prvphy",
                         "tm_state_u_prvphy"]),
        dyn=stack(["state_t_dyn", "state_q0_dyn", "state_u_dyn"]),
        tm_dyn=stack(["tm_state_t_dyn", "tm_state_q0_dyn",
                      "tm_state_u_dyn"]),
    )


def physics_q1_from_rh(x_v4_raw, spec, grid: Grid | None = None):
    """v4 carries RH, not q1; recover q1 = rh * qsat(t, pmid) with the real
    hybrid-sigma mid-level pressure (data_utils.py:1049-1052)."""
    if grid is None:
        from ..grid import load_default_grid

        grid = load_default_grid()
    sl = spec.input_slices
    t = jnp.asarray(x_v4_raw[:, sl["state_t"]])
    rh = jnp.asarray(x_v4_raw[:, sl["state_rh"]])
    ps = jnp.asarray(x_v4_raw[:, sl["state_ps"].start])
    pmid = physics.midlevel_pressure(ps, jnp.asarray(grid.hyam),
                                     jnp.asarray(grid.hybm))
    qvs = (physics.RD * physics.saturation_pressure(t)) / (physics.RV * pmid)
    return rh * qvs


def newtonian_relaxation(clim_t, clim_q1, clim_u, tau_steps: float,
                         dt: float = physics.DT_TIMESTEP, lat=None,
                         diurnal_amp_k_per_day: float = 0.0,
                         steps_per_day: int = 72):
    """Prescribed host-dynamics forcing: Newtonian relaxation toward a
    climatology, optionally with a latitude-modulated diurnal cycle.

    The hybrid loop's host model (E3SM dynamics + the non-superparameterized
    physics) continually forces the columns back toward a bounded climate;
    without it the emulated-tendency system has no attractor and any rollout
    -- reference MMF or hybrid alike -- drifts without bound.  This factory
    supplies that role for driver-level coupled testing: T, q1 and u relax
    toward ``clim_*`` with an e-folding time of ``tau_steps`` model steps,
    plus an optional solar diurnal cycle in the T forcing (amplitude in
    K/day at the equator, scaled by cos(lat)).

    Applied identically to every run (reference ensemble members and the
    hybrid candidate), exactly as the real host dynamics is shared by the
    MMF and hybrid E3SM runs in the reference's online evaluation
    (online_testing/evaluation/monthly-online-rmse-visualization.ipynb).
    """
    rate = 1.0 / (float(tau_steps) * dt)  # per-second relaxation rate
    ct = jnp.asarray(clim_t)
    cq = jnp.asarray(clim_q1)
    cu = jnp.asarray(clim_u)
    if lat is not None and diurnal_amp_k_per_day > 0.0:
        prof = (diurnal_amp_k_per_day / 86400.0) * \
            jnp.cos(jnp.deg2rad(jnp.asarray(lat)))[:, None]
    else:
        prof = None

    def forcing(state, step):
        ft = (ct - state.t) * rate
        if prof is not None:
            ft = ft + prof * jnp.sin(2.0 * jnp.pi * step / steps_per_day)
        fq = (cq - state.q1) * rate
        fu = (cu - state.u) * rate
        # keep the scan carry dtype (f32 even under jax_enable_x64)
        return jnp.stack([ft, fq, fu], axis=1).astype(state.dyn.dtype)

    return forcing


class HybridDriver:
    """Rollout engine around a wrapper fn(params, x_v4_raw) -> (B, 368)."""

    def __init__(self, wrapper: Callable, grid: Grid,
                 dyn_forcing: Callable | None = None,
                 dt: float = physics.DT_TIMESTEP, remat: bool = False):
        """``remat=True`` wraps each rollout step in ``jax.checkpoint`` so
        a differentiated rollout (train/rollout_ft.py) recomputes step
        activations in the backward pass instead of storing all K steps'
        intermediates -- O(1)-step instead of O(K)-step HBM (a K=16 U-Net
        fine-tune otherwise exceeds a v5e chip's 16 GB).  Costs one extra
        forward per step only when gradients are taken."""
        self.wrapper = wrapper
        self.grid = grid
        self.dt = dt
        self.remat = remat
        self.dyn_forcing = dyn_forcing or (lambda state, step: (
            jnp.zeros_like(state.dyn)))
        spec = get_varspec("v4")
        self._sl = spec.output_slices  # 368-contract slices (v2 layout)
        self._spec = spec

    # -- feature assembly --------------------------------------------------
    def _pmid(self, ps):
        """Real hybrid-sigma mid-level pressure from the grid coefficients
        (replaces an earlier fabricated sigma^1.5 profile; the reference
        physics is hybrid-sigma everywhere, data_utils.py:1049-1052)."""
        return physics.midlevel_pressure(
            ps, jnp.asarray(self.grid.hyam), jnp.asarray(self.grid.hybm))

    def assemble_v4(self, s: ColumnState) -> jnp.ndarray:
        sigma = (jnp.arange(60) + 0.5) / 60.0
        ps = s.scalars[:, 0]  # state_ps is the first scalar in the v4 tail
        rh = physics.relative_humidity(s.t, s.q1, self._pmid(ps))
        profs = [s.t, rh, s.qc, s.qi, s.u, s.v,
                 s.dyn[:, 0], s.dyn[:, 1], s.dyn[:, 2],
                 s.tm_dyn[:, 0], s.tm_dyn[:, 1], s.tm_dyn[:, 2],
                 s.prvphy[:, 0], s.prvphy[:, 1], s.prvphy[:, 2],
                 s.prvphy[:, 3], s.prvphy[:, 4],
                 s.tm_prvphy[:, 0], s.tm_prvphy[:, 1], s.tm_prvphy[:, 2],
                 s.tm_prvphy[:, 3], s.tm_prvphy[:, 4]]
        # trace-gas profiles held fixed at climatology (zero anomaly drive)
        b = s.t.shape[0]
        gases = jnp.broadcast_to(
            jnp.stack([1e-6 * (1.2 - sigma) ** 2,
                       jnp.full((60,), 1e-6),
                       jnp.full((60,), 1e-6)]), (b, 3, 60))
        profs += [gases[:, 0], gases[:, 1], gases[:, 2]]
        return jnp.concatenate(
            [jnp.concatenate([p.reshape(b, 60) for p in profs], axis=1),
             s.scalars], axis=1)

    # -- one hybrid step ---------------------------------------------------
    def step(self, params, s: ColumnState, step_idx) -> tuple:
        return self._advance(params, s, self.assemble_v4(s), step_idx)

    def _advance(self, params, s: ColumnState, x, step_idx) -> tuple:
        tend = self.wrapper(params, x)  # (B, 368) raw
        sl = self._sl
        dt_t = tend[:, sl["ptend_t"]]
        dt_q1 = tend[:, sl["ptend_q0001"]]
        dt_qc = tend[:, sl["ptend_q0002"]]
        dt_qi = tend[:, sl["ptend_q0003"]]
        dt_u = tend[:, sl["ptend_u"]]
        dt_v = tend[:, sl["ptend_v"]]

        new_dyn = self.dyn_forcing(s, step_idx)
        new = ColumnState(
            t=s.t + (dt_t + new_dyn[:, 0]) * self.dt,
            q1=jnp.maximum(s.q1 + (dt_q1 + new_dyn[:, 1]) * self.dt, 0.0),
            qc=jnp.maximum(s.qc + dt_qc * self.dt, 0.0),
            qi=jnp.maximum(s.qi + dt_qi * self.dt, 0.0),
            u=s.u + (dt_u + new_dyn[:, 2]) * self.dt,
            v=s.v + dt_v * self.dt,
            scalars=s.scalars,
            prvphy=jnp.stack([dt_t, dt_q1, dt_qc, dt_qi, dt_u], axis=1),
            tm_prvphy=s.prvphy,
            dyn=new_dyn,
            tm_dyn=s.dyn,
        )
        return new, tend

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def rollout(self, params, state0: ColumnState, n_steps: int,
                collect_features: bool = False, start_step=0):
        """lax.scan rollout; returns (final_state, trajectory dict).

        ``start_step`` offsets the step index seen by the host-dynamics
        forcing (traced, so advancing it costs no recompile).  Segmented
        long rollouts MUST pass the running offset: the diurnal cycle is
        a function of absolute step, and restarting each segment at 0
        would jump the solar phase at every segment boundary.

        The trajectory includes the per-step column water-budget residual
        (the water_conservation.ipynb check): a coupling-grade emulator
        should keep it bounded over the rollout; secular growth flags a
        physics-breaking model.

        ``collect_features=True`` additionally records the assembled raw
        v4 feature vector at every step under key ``"x4"`` -- the
        on-manifold sampling path used to build coupling training sets
        from reference rollouts (scripts/online_eval.py).  Costs
        n_steps x B x 1525 floats of HBM; segment long collections.
        """
        sl = self._sl
        hyai = jnp.asarray(self.grid.hyai)
        hybi = jnp.asarray(self.grid.hybi)

        def body(carry, step_idx):
            x = self.assemble_v4(carry)
            new, tend = self._advance(params, carry, x, step_idx)
            ps = carry.scalars[:, 0]
            lhflx = carry.scalars[:, 2]  # ps, SOLIN, LHFLX, ... scalar order
            wres = physics.column_water_residual(
                (tend[:, sl["ptend_q0001"]], tend[:, sl["ptend_q0002"]],
                 tend[:, sl["ptend_q0003"]]),
                ps, hyai, hybi,
                tend[:, sl["cam_out_PRECC"].start],
                tend[:, sl["cam_out_PRECSC"].start], lhflx)
            out = {"t": new.t, "q1": new.q1,
                   "qn": new.qc + new.qi, "u": new.u,
                   "precc": tend[:, sl["cam_out_PRECC"].start],
                   "water_res": wres}
            if collect_features:
                out["x4"] = x
            return new, out

        if self.remat:
            body = jax.checkpoint(body)
        final, traj = jax.lax.scan(
            body, state0, jnp.arange(n_steps) + start_step)
        return final, traj

    @partial(jax.jit, static_argnums=(0, 3))
    def rollout_ensemble(self, params, states0, n_steps: int,
                         start_step=0):
        """All ensemble members in ONE compiled program.

        ``states0``: a ColumnState whose leaves carry a leading member
        axis (jax.tree.map(jnp.stack, ...) over per-member states).  The
        member axis vmaps over the rollout -- the TPU-idiomatic form of
        the reference's per-member notebook loops (the online evaluation
        compares against a 3-member perturbed-IC MMF ensemble,
        online_testing/evaluation/*.ipynb): members x columns becomes
        one batched device computation instead of E sequential rollouts.
        Matches the per-member loop exactly (test_online.py).

        Memory: ALL members' trajectories live in HBM at once
        (E x steps x ncol x ~242 f32) -- for year-scale windows use the
        sequential per-member ``rollout`` loop, which offloads each
        trajectory to host (scripts/online_eval.py picks automatically).
        """
        return jax.vmap(
            lambda s0: self.rollout(params, s0, n_steps,
                                    start_step=start_step))(states0)


jax.tree_util.register_dataclass(
    ColumnState,
    data_fields=["t", "q1", "qc", "qi", "u", "v", "scalars", "prvphy",
                 "tm_prvphy", "dyn", "tm_dyn"],
    meta_fields=[])


class V2RHDriver(HybridDriver):
    """Rollout variant for v2_rh-family models (MLP_v2rh): the wrapper
    takes the 557-feature v2_rh layout (t, rh, qc, qi, u, v, gases, ps +
    surface scalars -- varspec.py V2_RH_INPUTS) instead of v4."""

    def __init__(self, wrapper, grid, dyn_forcing=None,
                 dt: float = physics.DT_TIMESTEP):
        super().__init__(wrapper, grid, dyn_forcing, dt)
        self._spec_in = get_varspec("v2_rh")

    def assemble_v4(self, s: ColumnState) -> jnp.ndarray:  # name kept: hook
        sigma = (jnp.arange(60) + 0.5) / 60.0
        ps = s.scalars[:, 0]
        rh = physics.relative_humidity(s.t, s.q1, self._pmid(ps))
        b = s.t.shape[0]
        gases = jnp.broadcast_to(
            jnp.stack([1e-6 * (1.2 - sigma) ** 2,
                       jnp.full((60,), 1e-6),
                       jnp.full((60,), 1e-6)]), (b, 3, 60))
        profs = [s.t, rh, s.qc, s.qi, s.u, s.v,
                 gases[:, 0], gases[:, 1], gases[:, 2]]
        # the first 17 v4 scalars (ps, 6 pbuf fluxes, 10 cam_in) are
        # exactly the v2_rh scalar block in order
        scal = s.scalars[:, :17]
        return jnp.concatenate(
            [jnp.concatenate([p.reshape(b, 60) for p in profs], axis=1),
             scal], axis=1)
