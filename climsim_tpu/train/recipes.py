"""End-to-end training recipes: model + transforms + loss + optimizer wired
into jitted sharded steps, one constructor per baseline family.

Each recipe returns a ``Trainer`` whose ``train_step``/``eval_step`` take
*raw* (un-normalized) device batches -- normalization, pruning, clipping and
target scaling run inside the jit (data.transforms), fused with the model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..data import transforms as T
from ..norms import NormStats
from ..parallel.mesh import ShardingRules
from ..varspec import VarSpec
from . import losses, schedules
from .step import (TrainState, create_train_state, make_eval_step,
                   make_predict_fn, make_train_step)


@dataclass
class Trainer:
    model: Any
    state: TrainState
    train_step: Callable
    eval_step: Callable
    predict: Callable           # params, raw inputs -> normalized preds
    sample: Callable | None = None  # stochastic models: (params, x, rng, S)
    input_transform: Callable | None = None
    apply: Callable | None = None   # pure jittable (params, x_raw) -> preds
                                    # (what predict wraps with host batching)


def _optimizer(schedule, optimizer_name: str = "adam", clip: float | None = None):
    opt = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
        "radam": optax.radam,
    }[optimizer_name](schedule)
    if clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt


def _common(model, spec, stats, cfg, rules, rng, sample_batch,
            loss_kind="mse", block_weights=None, schedule=None,
            optimizer_name="adam", deterministic_loss=False,
            energy_weight: float = 0.0, water_weight: float = 0.0,
            grid=None, input_post: Callable | None = None):
    """Wire a deterministic flat-output model (mlp/ed/online mlp).

    input_post: optional feature-space transform applied AFTER
    normalization (e.g. the UTLS subset for MLP v2); the energy/water
    losses read ps/LHFLX from the pre-post (full) feature layout.
    """
    in_t_full = T.make_input_transform(spec, stats, cfg)
    if input_post is None:
        in_t = in_t_full
    else:
        def in_t(x):
            return input_post(in_t_full(x))
    tgt_t = T.make_target_transform(spec, stats, cfg)
    weight = (losses.block_weight_vector(spec, block_weights)
              if block_weights else None)
    base_loss = losses.LOSS_FNS[loss_kind]
    out_scale = jnp.asarray(stats.out_scale, jnp.float32)
    if energy_weight > 0.0 or water_weight > 0.0:
        assert grid is not None
        hyai = jnp.asarray(grid.hyai, jnp.float32)
        hybi = jnp.asarray(grid.hybi, jnp.float32)
        ps_i = spec.ps_index
        ps_sub = float(stats.inp_sub[ps_i])
        ps_div = float(stats.inp_div[ps_i])
        lh_i = spec.input_slices["pbuf_LHFLX"].start
        lh_sub = float(stats.inp_sub[lh_i])
        lh_div = float(stats.inp_div[lh_i])

    def loss_fn(params, rng_, xb, yb):
        x_full = in_t_full(xb)
        x = input_post(x_full) if input_post is not None else x_full
        y = tgt_t(yb)
        kw = {}
        if rng_ is not None and not deterministic_loss:
            kw = dict(deterministic=False, rngs={"dropout": rng_})
        pred = model.apply(params, x, **kw)
        loss = base_loss(pred, y, weight)
        aux = {}
        if energy_weight > 0.0 or water_weight > 0.0:
            ps_raw = x_full[:, ps_i] * ps_div + ps_sub
        if energy_weight > 0.0:
            e = losses.energy_loss(pred, y, ps_raw, hyai, hybi,
                                   out_scale, spec)
            aux["energy_loss"] = e
            loss = loss + energy_weight * e
        if water_weight > 0.0:
            lh_raw = x_full[:, lh_i] * lh_div + lh_sub
            w = losses.water_loss(pred, y, ps_raw, lh_raw, hyai, hybi,
                                  out_scale, spec)
            aux["water_loss"] = w
            loss = loss + water_weight * w
        return loss, aux

    params = model.init(rng, in_t(sample_batch[0][:2]))
    if rules is not None:
        params = rules.params(params)
    opt = _optimizer(schedule, optimizer_name)
    state = create_train_state(params, opt, jax.random.fold_in(rng, 1), rules)

    def apply_norm(params_, x_raw):
        return model.apply(params_, in_t(x_raw))

    return Trainer(
        model=model,
        state=state,
        train_step=make_train_step(loss_fn, opt, rules),
        eval_step=make_eval_step(loss_fn, rules),
        predict=make_predict_fn(apply_norm, rules),
        input_transform=in_t,
        apply=apply_norm,
    )


def mlp_trainer(spec: VarSpec, stats: NormStats, sample_batch, rng,
                rules: ShardingRules | None = None, hidden=(768, 640, 512,
                640, 640), activation="relu", steps_per_epoch=1000,
                cfg: T.TransformConfig | None = None, **kw):
    """NeurIPS MLP baseline: cyclic LR + MSE (hpo_baseline_v1.py:106-137)."""
    from ..models import ClimSimMLP

    model = ClimSimMLP(spec=spec, hidden=tuple(hidden), activation=activation)
    sched = schedules.cyclic_triangular2(2.5e-4, 2.5e-3, 2 * steps_per_epoch)
    return _common(model, spec, stats, cfg, rules, rng, sample_batch,
                   loss_kind="mse", schedule=sched,
                   deterministic_loss=True, **kw)


def mlp_v2_trainer(spec: VarSpec, stats: NormStats, sample_batch, rng,
                   rules: ShardingRules | None = None,
                   hidden=(768, 640, 512, 640, 640), activation="relu",
                   steps_per_epoch=1000, cfg: T.TransformConfig | None = None,
                   utls_lo: int = 5, utls_hi: int = 21, **kw):
    """MLP v2 baseline: v2 features with ozone/CH4/N2O truncated to the
    UTLS levels [utls_lo, utls_hi) -> 425 inputs -> 368 outputs, same
    cyclic-LR MSE recipe as v1 (hpo_baseline_v2.py:58-60,154-177).

    The subset runs inside the jit after normalization, so raw batches
    stay in the full v2 layout (shards are reusable across v2 variants).
    """
    from ..models import ClimSimMLP

    model = ClimSimMLP(spec=spec, hidden=tuple(hidden), activation=activation)
    idx = T.utls_feature_indices(spec, lo=utls_lo, hi=utls_hi)
    post = T.make_subset_transform(idx)
    sched = schedules.cyclic_triangular2(2.5e-4, 2.5e-3, 2 * steps_per_epoch)
    return _common(model, spec, stats, cfg, rules, rng, sample_batch,
                   loss_kind="mse", schedule=sched, deterministic_loss=True,
                   input_post=post, **kw)


def ed_trainer(spec, stats, sample_batch, rng, rules=None,
               steps_per_epoch=1000, cfg=None, **kw):
    """ED: Adam 1e-4, /5 every 7 epochs (ClimSIM_ED_1_3_train.py:92-126)."""
    from ..models import EncoderDecoder

    model = EncoderDecoder(spec=spec)
    sched = schedules.step_decay(1e-4, 7 * steps_per_epoch, 0.2)
    return _common(model, spec, stats, cfg, rules, rng, sample_batch,
                   loss_kind="mse", schedule=sched,
                   deterministic_loss=True, **kw)


def online_mlp_trainer(spec, stats, sample_batch, rng, rules=None,
                       hidden=(1024,) * 4, steps_per_epoch=1000, cfg=None,
                       loss_kind="mse", block_weights=None,
                       energy_weight=0.0, grid=None, lr=1e-3, **kw):
    from ..models import OnlineMLP

    model = OnlineMLP(spec=spec, hidden=tuple(hidden))
    sched = schedules.warmup_then(schedules.constant(lr),
                                  steps_per_epoch // 2)
    return _common(model, spec, stats, cfg, rules, rng, sample_batch,
                   loss_kind=loss_kind, block_weights=block_weights,
                   schedule=sched, energy_weight=energy_weight, grid=grid,
                   deterministic_loss=True, **kw)


def _dropout_key(rng, impl: str | None):
    """Training-state RNG key, optionally on a cheaper generator.

    Dropout masks don't need threefry's statistical strength; the rbg
    generator produces the random bits ~1.2-1.4x faster on TPU, which
    matters for the CNN where 24 (B, 60, 406) masks per step made RNG
    ~45% of the step time (scripts/bench_cnn.py)."""
    base = jax.random.fold_in(rng, 1)
    if impl is None:
        return base
    import numpy as np

    seed = int(np.asarray(jax.random.key_data(base)).ravel()[-1])
    return jax.random.key(seed, impl=impl)


def cnn_trainer(spec, stats, sample_batch, rng, rules=None,
                steps_per_epoch=1000, cfg=None, depth=12, channels=406,
                dropout=0.175, loss_kind="mae",
                dropout_rng_impl: str | None = "rbg", **kw):
    """CNN on the channelized view with the adjusted loss
    (hpo_train.py:114-236)."""
    from ..models import ClimSimCNN

    model = ClimSimCNN(spec=spec, depth=depth, channels=channels,
                       dropout=dropout)
    in_t = T.make_input_transform(spec, stats, cfg)
    tgt_t = T.make_target_transform(spec, stats, cfg)
    sched = schedules.cyclic_triangular2(1e-4, 1e-3, 2 * steps_per_epoch)

    def loss_fn(params, rng_, xb, yb):
        x_ch = T.channelize_input(in_t(xb), spec)
        y_ch = T.channelize_target(tgt_t(yb), spec)
        kw_ = {}
        if rng_ is not None:
            kw_ = dict(deterministic=False, rngs={"dropout": rng_})
        pred = model.apply(params, x_ch, **kw_)
        return losses.channel_adjusted(pred, y_ch, spec, loss_kind), {}

    x0 = T.channelize_input(in_t(sample_batch[0][:2]), spec)
    params = model.init(rng, x0)
    if rules is not None:
        params = rules.params(params)
    opt = _optimizer(sched)
    state = create_train_state(params, opt,
                               _dropout_key(rng, dropout_rng_impl), rules)

    def apply_norm(params_, x_raw):
        y_ch = model.apply(params_, T.channelize_input(in_t(x_raw), spec))
        return T.dechannelize_output(y_ch, spec)

    return Trainer(model=model, state=state,
                   train_step=make_train_step(loss_fn, opt, rules),
                   eval_step=make_eval_step(loss_fn, rules),
                   predict=make_predict_fn(apply_norm, rules),
                   input_transform=in_t, apply=apply_norm)


def hsr_trainer(spec, stats, sample_batch, rng, rules=None, hidden=1024,
                layers=4, dropout=0.0, lr=1e-4, total_epochs=20,
                cfg=None, **kw):
    """HSR with the staged MSE->NLL loss.  The stage flag is static (two jit
    variants), switched by the caller at epoch boundaries via
    ``trainer.train_step = trainer.stage2_step`` after total_epochs/3."""
    from ..models import HSR

    model = HSR(spec=spec, hidden=hidden, layers=layers, dropout=dropout)
    in_t = T.make_input_transform(spec, stats, cfg)
    tgt_t = T.make_target_transform(spec, stats, cfg)

    def make_loss(mse_stage):
        def loss_fn(params, rng_, xb, yb):
            x, y = in_t(xb), tgt_t(yb)
            kw_ = {}
            if rng_ is not None and dropout > 0:
                kw_ = dict(deterministic=False, rngs={"dropout": rng_})
            mean, logprec = model.apply(params, x, **kw_)
            return losses.hsr_loss(mean, logprec, y, mse_stage), {}
        return loss_fn

    params = model.init(rng, in_t(sample_batch[0][:2]))
    if rules is not None:
        params = rules.params(params)
    opt = _optimizer(schedules.constant(lr))
    state = create_train_state(params, opt, jax.random.fold_in(rng, 1), rules)

    def apply_norm(params_, x_raw):
        mean, _ = model.apply(params_, in_t(x_raw))
        return mean

    def sample(params_, x_raw, rng_, num_samples=32):
        return model.sample(params_, in_t(x_raw), rng_, num_samples)

    tr = Trainer(model=model, state=state,
                 train_step=make_train_step(make_loss(True), opt, rules),
                 eval_step=make_eval_step(make_loss(False), rules),
                 predict=make_predict_fn(apply_norm, rules),
                 sample=sample, input_transform=in_t, apply=apply_norm)
    tr.stage2_step = make_train_step(make_loss(False), opt, rules)
    return tr


def cvae_trainer(spec, stats, sample_batch, rng, rules=None, latent=8,
                 hidden=512, layers=2, beta=0.01, lr=1e-4, cfg=None, **kw):
    from ..models import CVAE

    model = CVAE(spec=spec, latent=latent, hidden=hidden, layers=layers)
    in_t = T.make_input_transform(spec, stats, cfg)
    tgt_t = T.make_target_transform(spec, stats, cfg)

    def loss_fn(params, rng_, xb, yb):
        x, y = in_t(xb), tgt_t(yb)
        r = rng_ if rng_ is not None else jax.random.PRNGKey(0)
        y_mean, y_std, kl = model.apply(params, y, x, rng=r)
        return losses.cvae_loss(y_mean, y_std, kl, y, beta), {"kl": kl}

    x0 = in_t(sample_batch[0][:2])
    y0 = tgt_t(sample_batch[1][:2])
    params = model.init(rng, y0, x0, rng=jax.random.PRNGKey(0))
    if rules is not None:
        params = rules.params(params)
    opt = _optimizer(schedules.constant(lr))
    state = create_train_state(params, opt, jax.random.fold_in(rng, 1), rules)

    def apply_norm(params_, x_raw):
        mean, _std = model.apply(params_, jnp.zeros(
            (x_raw.shape[0], latent)), in_t(x_raw), method=CVAE.decode)
        return mean

    def sample(params_, x_raw, rng_, num_samples=32):
        return model.sample(params_, in_t(x_raw), rng_, num_samples)

    return Trainer(model=model, state=state,
                   train_step=make_train_step(loss_fn, opt, rules),
                   eval_step=make_eval_step(loss_fn, rules),
                   predict=make_predict_fn(apply_norm, rules),
                   sample=sample, input_transform=in_t, apply=apply_norm)


def unet_trainer(spec, stats, sample_batch, rng, rules=None,
                 steps_per_epoch=1000, cfg=None, model_kw=None,
                 loss_kind="huber", block_weights=None, energy_weight=0.0,
                 grid=None, lr=1e-3, schedule_name="cosine",
                 total_epochs=30, **kw):
    """Coupling-grade U-Net recipe (Unet_v4/v5 trainer semantics:
    train_unet_h5loader.py:209-268 -- Adam, {mse|mae|huber} with optional
    per-block weights and energy penalty, cosine/step/plateau schedules)."""
    from ..models.unet import ClimSimUNet

    model = ClimSimUNet(spec=spec, **(model_kw or {}))
    cfg = cfg or (T.v5_online_config() if spec.name == "v5"
                  else T.TransformConfig())
    sched = schedules.build(schedule_name, steps_per_epoch, init_lr=lr,
                            decay_epochs=total_epochs)
    return _common(model, spec, stats, cfg, rules, rng, sample_batch,
                   loss_kind=loss_kind, block_weights=block_weights,
                   schedule=sched, energy_weight=energy_weight, grid=grid,
                   deterministic_loss=(model.dropout == 0.0), **kw)


def classifier_labels(x_raw, y_raw, spec, threshold_class1=1e-9,
                      threshold_class2=1e-11, dt=1200.0):
    """3-class per-level labels for the v5 two-stage classifier, exactly
    the reference's construction (climsim_datapip_classifier_h5.py:118-122):
      class 0: |dqn/dt| <= threshold_class2  (tendency is zero)
      class 1: qn + dqn*1200 <= threshold_class1  (cloud fully evaporates)
      class 2: regular condensate evolution (regressor applies)
    x_raw/y_raw are raw (un-normalized) batches."""
    qn = x_raw[:, spec.input_slices["state_qn"]]
    dqn = y_raw[:, spec.output_slices["ptend_qn"]]
    qn_next = qn + dqn * dt
    labels = jnp.where(qn_next <= threshold_class1, 1, 2)
    return jnp.where(jnp.abs(dqn) <= threshold_class2, 0, labels)


def unet_classifier_trainer(spec, stats, sample_batch, rng, rules=None,
                            steps_per_epoch=1000, cfg=None, model_kw=None,
                            lr=1e-3, threshold_class1=1e-9,
                            threshold_class2=1e-11, **kw):
    """3-class per-level cloud classifier for the v5 two-stage scheme
    (climsim_unet_classifier.py + train_unet_h5loader_classifier.py:306-311:
    CrossEntropyLoss on (batch*level, 3) logits; label thresholds
    threshold_class1/2 from conf/config_single.yaml:63-64)."""
    from ..models.unet import ClimSimUNet

    model = ClimSimUNet(spec=spec, classifier=True, **(model_kw or {}))
    cfg = cfg or T.v5_online_config()
    in_t = T.make_input_transform(spec, stats, cfg)

    def loss_fn(params, rng_, xb, yb):
        x = in_t(xb)
        labels = classifier_labels(xb, yb, spec, threshold_class1,
                                   threshold_class2)
        kw_ = {}
        if rng_ is not None and model.dropout > 0:
            kw_ = dict(deterministic=False, rngs={"dropout": rng_})
        logits = model.apply(params, x, **kw_)  # (B, 60, 3)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
        return jnp.mean(ce), {"accuracy": acc}

    params = model.init(rng, in_t(sample_batch[0][:2]))
    if rules is not None:
        params = rules.params(params)
    opt = _optimizer(schedules.constant(lr))
    state = create_train_state(params, opt, jax.random.fold_in(rng, 1),
                               rules)

    def apply_prob(params_, x_raw):
        """(B, 60, 3) class probabilities."""
        return jax.nn.softmax(model.apply(params_, in_t(x_raw)), axis=-1)

    return Trainer(model=model, state=state,
                   train_step=make_train_step(loss_fn, opt, rules),
                   eval_step=make_eval_step(loss_fn, rules),
                   predict=make_predict_fn(apply_prob, rules),
                   input_transform=in_t, apply=apply_prob)
