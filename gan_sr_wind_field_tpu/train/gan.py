"""WindFieldGAN — the 3D ESRGAN trainer core, as ONE jitted train step.

TPU-first redesign of the reference trainer
(GAN_models/wind_field_GAN_3D.py:26-814):

- The whole iteration — G/D alternation, label ramps, instance-noise
  annealing, physics losses with global-max normalisation, Adam + MultiStepLR
  — is a single compiled XLA program. `it` is threaded as a traced scalar so
  none of the schedules retrigger compilation; the G-vs-D choice
  (``(it // d_g_train_period) % (ratio+1) == 0``, reference :585-593) is a
  `lax.cond` between two branches with identical output trees.
- All randomness (dropout, instance noise, noisy labels, device-side
  augmentation) flows from one explicit PRNG key in the state.
- Optimizer: optax `scale_by_adam` with the learning rate applied manually
  from the multistep schedule of the traced `it` — exact torch
  Adam+MultiStepLR semantics including the 2·period scheduler offset
  (train.py:152) and the skip-update-on-non-finite-loss guard (:457-460).
- Parity quirks preserved: relativistic-average BCE losses with the
  ``-0.1985`` D-loss bias when labels are exactly 0.9 (:557-558), physics
  losses dropped from the total on NaN/Inf (:434-454), signed-max z-gradient
  normalisation, instance noise σ=2 for eval-D and σ=1 for train-D forwards.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gan_sr_wind_field_tpu.data.augment import augment_batch
from gan_sr_wind_field_tpu.models import Discriminator3D, Generator3D
from gan_sr_wind_field_tpu.ops.metrics import psnr as psnr_fn
from gan_sr_wind_field_tpu.ops.physics import (
    divergence_3d,
    divergence_xy,
    gradient_norm_factors,
    wind_field_gradient,
)
from gan_sr_wind_field_tpu.ops.resize import upsample_trilinear_xy
from gan_sr_wind_field_tpu.train import tricks
from gan_sr_wind_field_tpu.train.schedule import label_values, multistep_lr


def _act_slope(act_type: str) -> float:
    """Config act_type → LeakyReLU slope. 'relu' is a slope-0 LeakyReLU;
    anything else falls back to leakyrelu(0.2) with a warning, mirroring
    the reference (Generator_3D_Resnet_ESRGAN.py:50-56)."""
    act = (act_type or "leakyrelu").lower()
    if act == "relu":
        return 0.0
    if act != "leakyrelu":
        import logging

        logging.getLogger("status").warning(
            f"activation type {act_type} not implemented - "
            "defaulting to leaky ReLU (0.2)"
        )
    return 0.2


def bce_with_logits(logits, targets):
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss)."""
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class GANTrainState(flax.struct.PyTreeNode):
    params_G: Any
    params_D: Any
    batch_stats_D: Any
    params_D_frozen: Any  # frozen feature extractor (empty dict if unused)
    opt_state_G: Any
    opt_state_D: Any
    it: jnp.ndarray  # int32 scalar, number of completed iterations
    rng: jax.Array
    # EMA of params_G (cfg.training.g_ema_decay > 0) — None when disabled,
    # so checkpoints and traces are unchanged for the parity default
    params_G_ema: Any = None


def _zeros_loss_dict():
    keys = (
        "total", "adversarial", "pix", "xy_gradient", "z_gradient",
        "divergence", "xy_divergence", "feature_D",
    )
    return {k: jnp.float32(0.0) for k in keys}


class WindFieldGAN:
    """Builds models/optimizers from a Config and exposes jitted steps.

    Usage:
        gan = WindFieldGAN(cfg, x, y)
        state = gan.init_state(jax.random.key(seed), lr_shape, hr_shape)
        state, logs = gan.train_step(state, LR, HR, Z)
        logs, new_bs = gan.val_step(state, LR, HR, Z)
        sr = gan.generate(state.params_G, LR, Z)
    """

    def __init__(self, cfg, x, y, mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        t = cfg.training
        g = cfg.gan_config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        self.G = Generator3D(
            in_channels=cfg.lr_num_channels,
            out_channels=cfg.generator.out_num_ch,
            num_features=cfg.generator.num_features,
            num_rrdb=cfg.generator.num_RRDB,
            upscale=cfg.scale,
            hr_kern_size=cfg.generator.hr_kern_size,
            num_rdb_convs=cfg.generator.num_RDB_convs,
            rdb_growth_channels=cfg.generator.RDB_growth_chan,
            lff_kern_size=cfg.generator.lff_kern_size,
            rdb_residual_scaling=cfg.generator.RDB_res_scaling,
            rrdb_residual_scaling=cfg.generator.RRDB_res_scaling,
            terrain_features=cfg.generator.terrain_number_of_features,
            dropout_probability=cfg.generator.dropout_probability,
            init_scale=cfg.generator.weight_init_scale,
            dtype=dtype,
            remat=cfg.generator.use_remat,
            pallas_head=getattr(cfg, "use_pallas_head", False),
            conv_mode=g.conv_mode,
            negative_slope=_act_slope(cfg.generator.act_type),
        )
        # like the reference, the models are built from the GAN-level
        # conv_mode (wind_field_GAN_3D.py:110,133); the per-section keys
        # are parsed but unwired there too (cfg_G.conv_mode is stored at
        # :119 and only read by commented-out code)
        for sec, val in (("GENERATOR", cfg.generator.conv_mode),
                         ("DISCRIMINATOR", cfg.discriminator.conv_mode)):
            if val != g.conv_mode:
                import logging

                logging.getLogger("status").warning(
                    f"[{sec}] conv_mode={val} is ignored; models use "
                    f"[GAN] conv_mode={g.conv_mode} (reference semantics)"
                )
        # optional overrides for the no-grad forward only (D steps,
        # validation SR, serving): these schedule-sensitive reassociations
        # measured a WIN in the no-grad graph but a REGRESSION inside the
        # G-train graph (scripts/probe_g_step.py A/B on v5e) — the pallas
        # head kernel loses in both and stays off by default
        nograd_overrides = {}
        if getattr(cfg, "use_pallas_head_nograd", False):
            nograd_overrides["pallas_head"] = True
        if getattr(cfg, "split_hr_out_nograd", True):
            # hr_conv0 forward as full-lane main conv + tap-stacked
            # remainder: D step 160.8 -> 156.2 ms measured; the G-train
            # graph regressed (407.6 -> 419.1), so it stays train-off
            nograd_overrides["split_hr_out"] = True
        self._G_nograd = (
            self.G.clone(**nograd_overrides) if nograd_overrides else self.G
        )
        self.D = Discriminator3D(
            in_channels=cfg.discriminator.in_num_ch,
            base_features=cfg.discriminator.num_features,
            feat_kern_size=cfg.discriminator.feat_kern_size,
            norm=cfg.discriminator.norm_type,
            number_of_z_layers=g.number_of_z_layers,
            enable_slicing=g.enable_slicing,
            dropout_probability=cfg.discriminator.dropout_probability,
            init_scale=cfg.discriminator.weight_init_scale,
            dtype=dtype,
            conv_mode=g.conv_mode,
            negative_slope=_act_slope(cfg.discriminator.act_type),
        )

        self.x = jnp.asarray(x, jnp.float32)
        self.y = jnp.asarray(y, jnp.float32)
        self.niter = float(t.niter)
        self.mesh = mesh

        # static training hyperparameters
        self.gan_type = t.gan_type
        self.d_g_train_ratio = t.d_g_train_ratio
        self.d_g_train_period = t.d_g_train_period
        self.pixel_criterion = (t.pixel_criterion or "none").lower()
        self.use_instance_noise = t.use_instance_noise
        self.use_noisy_labels = t.use_noisy_labels
        self.use_one_sided_label_smoothing = t.use_one_sided_label_smoothing
        self.flip_labels = t.flip_labels
        self.use_feature_D = g.use_D_feature_extractor_cost
        self.feature_D_update_period = t.feature_D_update_period
        self.w_adv = t.adversarial_loss_weight
        self.w_feat = t.feature_D_loss_weight
        # the 5 searchable loss weights are TRACED (passed through the jitted
        # step) so hyperparameter-sweep trials share one compiled program —
        # the reference recompiles nothing but pays a full Ray trial spin-up
        # per sample (param_search.py:390-421); here a new trial is just a
        # new scalar vector
        self.default_weights = {
            "pix": jnp.float32(t.pixel_loss_weight),
            "gxy": jnp.float32(t.gradient_xy_loss_weight),
            "gz": jnp.float32(t.gradient_z_loss_weight),
            "div": jnp.float32(t.divergence_loss_weight),
            "xydiv": jnp.float32(t.xy_divergence_loss_weight),
        }
        # D is only ever exercised when the adversarial signal matters
        self.use_adv = (self.w_adv != 0.0) or (t.d_g_train_ratio > 0)

        # optional fused Pallas RRDB-trunk kernel for no-grad G forwards
        # (D train branch + inference). Pallas calls are opaque to GSPMD, so
        # on data-parallel-only meshes the fused forward runs under
        # shard_map (each device applies the kernel to its batch shard);
        # tensor/spatial-sharded meshes keep the XLA trunk (its operands
        # would need halo/channel collectives inside the kernel).
        dp_only = mesh is not None and all(
            mesh.shape.get(ax, 1) == 1 for ax in ("model", "spatial")
        )
        self.use_fused_trunk = (
            getattr(cfg, "use_fused_trunk", False)
            and (mesh is None or mesh.size == 1 or dp_only)
            # the trunk custom VJP recovers sign(pre-activation) from the
            # saved post-activation — ambiguous at 0 for plain ReLU
            and self.G.negative_slope > 0
        )
        self._fused_shard_map = (
            self.use_fused_trunk and mesh is not None and mesh.size > 1
        )
        self._pallas_interpret = jax.default_backend() == "cpu"

        # optional fused Pallas stencil for the physics gradients (custom
        # VJP); interpret mode keeps it runnable on the CPU test mesh
        if getattr(cfg, "use_pallas_stencil", False):
            from gan_sr_wind_field_tpu.ops.pallas import (
                wind_field_gradient_fused,
            )

            interp = jax.default_backend() == "cpu"
            self._wind_gradient = functools.partial(
                wind_field_gradient_fused, interpret=interp
            )
        else:
            self._wind_gradient = wind_field_gradient

        if self.gan_type not in ("relativistic", "relativisticavg"):
            raise NotImplementedError(
                f"Only relativistic and relativisticavg GAN are implemented, "
                f"not {self.gan_type}"
            )
        if self.pixel_criterion not in ("l1", "l2", "none"):
            raise NotImplementedError(
                f"Only l1 and l2 pixel losses are implemented, "
                f"not {self.pixel_criterion}"
            )

        # torch Adam semantics: weight decay added to the gradient BEFORE the
        # moment updates; lr applied manually from the traced-it schedule.
        def make_opt(beta1, wd):
            txs = []
            if getattr(t, "use_grad_clipping", False):
                # documented fix: the reference configures max_norm but its
                # clip_grad_norm_ call is commented out (:458-459)
                txs.append(
                    optax.clip_by_global_norm(cfg.generator.max_norm)
                )
            if wd:
                txs.append(optax.add_decayed_weights(wd))
            txs.append(optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8))
            txs.append(optax.scale(-1.0))
            opt = optax.chain(*txs)
            if getattr(t, "optimizer_state_dtype", "float32") == "bfloat16_sr":
                from gan_sr_wind_field_tpu.ops.sr_cast import (
                    bf16_sr_optimizer_state,
                )

                opt = bf16_sr_optimizer_state(opt, seed=cfg.env.fixed_seed)
            return opt

        self.log_grad_norm = bool(getattr(t, "use_grad_clipping", False))
        self.ema_decay = float(getattr(t, "g_ema_decay", 0.0))
        self.opt_G = make_opt(t.adam_beta1_g, t.adam_weight_decay_g)
        self.opt_D = make_opt(t.adam_beta1_d, t.adam_weight_decay_d)
        if t.multistep_lr and t.multistep_lr_steps:
            self.lr_G = multistep_lr(
                t.learning_rate_g, t.multistep_lr_steps, t.lr_gamma,
                t.d_g_train_period,
            )
            self.lr_D = multistep_lr(
                t.learning_rate_d, t.multistep_lr_steps, t.lr_gamma,
                t.d_g_train_period,
            )
        else:
            self.lr_G = lambda it: jnp.float32(t.learning_rate_g)
            self.lr_D = lambda it: jnp.float32(t.learning_rate_d)

        # XLA:TPU scoped-VMEM override (cfg.xla_scoped_vmem_limit_kib): a
        # larger fusion-scratch budget lets the conv emitter pick deeper
        # tilings — measured G 424.7→407.0 ms, D 164.7→159.9 ms at 64 MiB
        # on v5e (scripts/probe_xla_opts.py). Passed per-jit because client
        # XLA_FLAGS don't reach remote compile services; skipped on CPU
        # where the flag doesn't exist.
        vmem_kib = int(getattr(cfg, "xla_scoped_vmem_limit_kib", 0) or 0)
        copts = (
            {"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)}
            if vmem_kib > 0
            and jax.default_backend() in ("tpu", "axon") else None
        )
        self._jit_train_step = jax.jit(
            self._train_step, donate_argnums=0, static_argnames=("augment",),
            compiler_options=copts,
        )
        self._jit_train_chunk = jax.jit(
            self._train_chunk, donate_argnums=0,
            static_argnames=("n_steps", "batch_size", "patch", "patch_y",
                             "cf", "enable_slicing", "augment"),
            compiler_options=copts,
        )
        self._jit_val_step = jax.jit(self._val_step, compiler_options=copts)
        self._jit_generate = jax.jit(self._generate, compiler_options=copts)
        self._jit_generate_q = jax.jit(
            self._generate_q, compiler_options=copts
        )

    # ------------------------------------------------------------------ init
    def init_state(self, rng, lr_shape, hr_shape) -> GANTrainState:
        """Initialise params/optimizers from example shapes (N,x,y,z,C)."""
        k_g, k_d, k_state = jax.random.split(rng, 3)
        lr_dummy = jnp.zeros(lr_shape, jnp.float32)
        z_dummy = jnp.zeros(hr_shape[:4] + (1,), jnp.float32)
        hr3_dummy = jnp.zeros(hr_shape[:4] + (3,), jnp.float32)

        # jit the inits: eager dispatch of hundreds of small init ops is far
        # slower than one fused compile
        vars_G = jax.jit(lambda k: self.G.init(k, lr_dummy, z_dummy, train=False))(k_g)
        params_G = vars_G["params"]

        vars_D = jax.jit(lambda k: self.D.init(k, hr3_dummy, train=False))(k_d)
        params_D = vars_D["params"]
        batch_stats_D = vars_D.get("batch_stats", {})

        return GANTrainState(
            params_G=params_G,
            params_D=params_D,
            batch_stats_D=batch_stats_D,
            # distinct buffers: the donated step may not alias params_D
            params_D_frozen=(
                jax.tree.map(jnp.copy, params_D) if self.use_feature_D else {}
            ),
            opt_state_G=self.opt_G.init(params_G),
            opt_state_D=self.opt_D.init(params_D),
            it=jnp.int32(0),
            rng=k_state,
            # distinct buffers (donation may not alias params_G)
            params_G_ema=(
                jax.tree.map(jnp.copy, params_G)
                if self.ema_decay > 0.0 else None
            ),
        )

    # ----------------------------------------------------------------- fwd
    def _g_forward_nograd(self, params_G, lr, z):
        """Eval-mode G forward: fused Pallas trunk when enabled/supported."""
        if self.use_fused_trunk:
            from gan_sr_wind_field_tpu.models.fused_apply import (
                fused_supported,
                generate_fused,
            )

            if fused_supported(self.G, lr.shape):
                fn = functools.partial(
                    generate_fused, self._G_nograd,
                    interpret=self._pallas_interpret,
                )
                if self._fused_shard_map:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    # params replicated, batch sharded over 'data'; each
                    # device runs the kernel on its local shard
                    # check_vma off: the pallas_call's out_shape carries no
                    # varying-mesh-axes annotation
                    fn = shard_map(
                        fn, mesh=self.mesh,
                        in_specs=(P(), P("data"), P("data")),
                        out_specs=P("data"), check_vma=False,
                    )
                return fn(params_G, lr, z)
        # flax fallback honours the no-grad overrides too (split_hr_out
        # engages SplitOutConv for hr_conv0_x; pallas_head is a fused-path
        # attribute the flax __call__ ignores)
        return self._G_nograd.apply({"params": params_G}, lr, z, train=False)

    def _g_forward_train(self, params_G, lr, z, train, dropout_key):
        """Differentiable G forward: fused Pallas trunk with the hand-written
        VJP (models/fused_train.py) when enabled; dropout masks match flax's
        (same key, shape and keep-prob), so trajectories coincide."""
        if self.use_fused_trunk:
            from gan_sr_wind_field_tpu.models.fused_apply import (
                fused_supported,
            )
            from gan_sr_wind_field_tpu.models.fused_train import (
                apply_trainable,
            )

            # single-device only: the custom-VJP backward's gradients would
            # need explicit psums under shard_map — the G update keeps
            # XLA+GSPMD on meshes (its fused gain is ~2% anyway)
            if (fused_supported(self.G, lr.shape) and not self.G.remat
                    and not self._fused_shard_map):
                return apply_trainable(
                    self.G, params_G, lr, z, train=train,
                    dropout_key=dropout_key,
                    interpret=self._pallas_interpret,
                )
        return self.G.apply(
            {"params": params_G}, lr, z, train=train, rng_key=dropout_key
        )

    def _generate(self, params_G, lr, z):
        return self._g_forward_nograd(params_G, lr, z)

    def generate(self, params_G, lr, z):
        return self._jit_generate(params_G, lr, z)

    def _generate_q(self, params_G, qhead, lr, z, qtrunk=None):
        """Serving forward with the calibrated int8 HR head (ops/quant.py)
        and/or int8 trunk (ops/quant_trunk.py).

        Fused-trunk, single-device path only — produced by
        WindFieldSR.quantize[_trunk]; training/validation numerics are
        untouched.
        """
        from gan_sr_wind_field_tpu.models.fused_apply import (
            fused_supported,
            generate_fused,
        )

        if not (self.use_fused_trunk and fused_supported(self.G, lr.shape)
                and not self._fused_shard_map):
            raise ValueError(
                "quantized serving needs the single-device fused-trunk "
                "path (use_fused_trunk=True, no model/spatial mesh)"
            )
        return generate_fused(
            self._G_nograd, params_G, lr, z,
            interpret=self._pallas_interpret, qhead=qhead, qtrunk=qtrunk,
        )

    def generate_quantized(self, params_G, qhead, lr, z, qtrunk=None):
        return self._jit_generate_q(params_G, qhead, lr, z, qtrunk)

    def _d_logits(self, params_D, batch_stats, xin, train_D, rng_key=None,
                  update_stats=False):
        variables = {"params": params_D, "batch_stats": batch_stats}
        if update_stats:
            out, mut = self.D.apply(
                variables, xin, train=True, rng_key=rng_key,
                mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
        return (
            self.D.apply(variables, xin, train=train_D, rng_key=rng_key),
            batch_stats,
        )

    # --------------------------------------------------------------- labels
    def _make_labels(self, key, it, batch_size):
        real_val, fake_val, pred_real, pred_fake = label_values(
            it, self.niter, self.use_one_sided_label_smoothing, self.flip_labels
        )
        k1, k2 = jax.random.split(key)
        std = 0.05 if self.use_noisy_labels else 0.0
        hr_labels = tricks.noisy_labels(
            k1, pred_real, batch_size, noise_stddev=std,
            true_label_val=real_val, false_label_val=fake_val,
        )
        fake_labels = tricks.noisy_labels(
            k2, pred_fake, batch_size, noise_stddev=std,
            true_label_val=real_val, false_label_val=fake_val,
        )
        return hr_labels, fake_labels

    def _noisy_d_input(self, key, xin, sigma, it):
        if not self.use_instance_noise:
            return xin
        return xin + tricks.instance_noise(key, sigma, xin.shape, it, self.niter)

    # -------------------------------------------------------------- G losses
    def _g_losses(self, params_G, state, lr, hr, z, it, keys, train: bool,
                  w=None):
        """Weighted G losses. Returns (total, dict, fake_HR).

        ``w``: traced dict of the 5 searchable loss weights (pix, gxy, gz,
        div, xydiv); defaults to the config values."""
        w = w or self.default_weights
        fake = self._g_forward_train(
            params_G, lr, z, train, keys["g_dropout"]
        )
        hr3 = hr[..., :3]
        batch = hr.shape[0]

        losses = _zeros_loss_dict()

        if self.use_adv:
            hr_labels, fake_labels = self._make_labels(keys["labels"], it, batch)
            # D eval-mode forwards with σ=2 instance noise
            # (reference D_forward train_D=False, wind_field_GAN_3D.py:273-302)
            kr, kf = jax.random.split(keys["inoise"])
            real_in = self._noisy_d_input(kr, hr3, 2.0, it)
            fake_in = self._noisy_d_input(kf, fake, 2.0, it)
            y_pred, _ = self._d_logits(
                state.params_D, state.batch_stats_D, real_in, train_D=False
            )
            y_pred = jax.lax.stop_gradient(y_pred)
            fake_y_pred, _ = self._d_logits(
                state.params_D, state.batch_stats_D, fake_in, train_D=False
            )
            if self.gan_type == "relativistic":
                adv = bce_with_logits(fake_y_pred - y_pred, hr_labels)
            else:  # relativisticavg
                adv = (
                    bce_with_logits(
                        fake_y_pred - jnp.mean(y_pred), hr_labels
                    )
                    + bce_with_logits(
                        y_pred - jnp.mean(fake_y_pred), fake_labels
                    )
                ) / 2.0
            losses["adversarial"] = adv * self.w_adv

        if self.use_feature_D:
            feats_hr = jax.lax.stop_gradient(
                self.D.apply(
                    {
                        "params": state.params_D_frozen,
                        "batch_stats": state.batch_stats_D,
                    },
                    hr3, train=False, features_only=True,
                )
            )
            feats_fake = self.D.apply(
                {
                    "params": state.params_D_frozen,
                    "batch_stats": state.batch_stats_D,
                },
                fake, train=False, features_only=True,
            )
            losses["feature_D"] = (
                jnp.mean((feats_hr - feats_fake) ** 2) * self.w_feat
            )

        if self.pixel_criterion == "l1":
            losses["pix"] = jnp.mean(jnp.abs(hr3 - fake)) * w["pix"]
        elif self.pixel_criterion == "l2":
            losses["pix"] = jnp.mean((hr3 - fake) ** 2) * w["pix"]

        hr_grad = self._wind_gradient(hr3, self.x, self.y, z)
        sr_grad = self._wind_gradient(fake, self.x, self.y, z)
        f_xy, f_z, f_div, f_xydiv = gradient_norm_factors(hr_grad, sr_grad)

        losses["xy_gradient"] = (
            jnp.mean((sr_grad[..., :6] / f_xy - hr_grad[..., :6] / f_xy) ** 2)
            * w["gxy"]
        )
        losses["z_gradient"] = (
            jnp.mean((sr_grad[..., 6:] / f_z - hr_grad[..., 6:] / f_z) ** 2)
            * w["gz"]
        )
        losses["divergence"] = (
            jnp.mean(
                (divergence_3d(hr_grad) / f_div - divergence_3d(sr_grad) / f_div)
                ** 2
            )
            * w["div"]
        )
        losses["xy_divergence"] = (
            jnp.mean(
                (divergence_xy(hr_grad) / f_xydiv
                 - divergence_xy(sr_grad) / f_xydiv) ** 2
            )
            * w["xydiv"]
        )

        physics = (
            losses["xy_gradient"] + losses["z_gradient"]
            + losses["divergence"] + losses["xy_divergence"]
        )
        physics_ok = jnp.isfinite(physics)
        # NaN/Inf guard: drop physics terms from the total
        # (reference wind_field_GAN_3D.py:434-454)
        total = (
            losses["adversarial"] + losses["pix"] + losses["feature_D"]
            + jnp.where(physics_ok, physics, 0.0)
        )
        losses["total"] = total
        return total, (losses, fake)

    # -------------------------------------------------------------- D losses
    def _d_loss(self, params_D, batch_stats, hr3, fake, it, keys,
                update_stats: bool):
        hr_labels, fake_labels = self._make_labels(
            keys["labels"], it, hr3.shape[0]
        )
        kr, kf = jax.random.split(keys["inoise"])
        kd1, kd2 = jax.random.split(keys["d_dropout"])
        # train-D forwards: σ=1 instance noise, BN batch mode, dropout on
        real_in = self._noisy_d_input(kr, hr3, 1.0, it)
        fake_in = self._noisy_d_input(kf, jax.lax.stop_gradient(fake), 1.0, it)
        y_pred, bs1 = self._d_logits(
            params_D, batch_stats, real_in, train_D=True, rng_key=kd1,
            update_stats=update_stats,
        )
        fake_y_pred, bs2 = self._d_logits(
            params_D, bs1, fake_in, train_D=True, rng_key=kd2,
            update_stats=update_stats,
        )
        if self.gan_type == "relativistic":
            loss = bce_with_logits(y_pred - fake_y_pred, hr_labels)
        else:
            loss = (
                bce_with_logits(y_pred - jnp.mean(fake_y_pred), hr_labels)
                + bce_with_logits(fake_y_pred - jnp.mean(y_pred), fake_labels)
            ) / 2.0
            # magic bias when one-sided-smoothed labels are exactly 0.9
            # (reference wind_field_GAN_3D.py:557-558)
            loss = jnp.where(jnp.all(hr_labels == 0.9), loss - 0.1985, loss)
        return loss, (bs2, y_pred, fake_y_pred)

    # ----------------------------------------------------------- train step
    def _split_keys(self, rng):
        names = ("g_dropout", "labels", "inoise", "d_dropout", "aug", "next")
        ks = jax.random.split(rng, len(names))
        return dict(zip(names, ks))

    def _g_branch(self, state, lr, hr, z, it, keys, w):
        grad_fn = jax.value_and_grad(self._g_losses, has_aux=True)
        (loss, (losses, _fake)), grads = grad_fn(
            state.params_G, state, lr, hr, z, it, keys, True, w
        )
        finite = jnp.isfinite(loss)
        updates, new_opt = self.opt_G.update(
            grads, state.opt_state_G, state.params_G
        )
        lr_t = self.lr_G(it)
        new_params = jax.tree.map(
            lambda p, u: p + u * lr_t, state.params_G, updates
        )
        # skip the whole optimizer step on non-finite loss (reference :457-460)
        params_G = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_params, state.params_G,
        )
        opt_state_G = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_opt, state.opt_state_G,
        )
        metrics = dict(losses)
        metrics["D_train_loss"] = jnp.float32(0.0)
        metrics["is_g_step"] = jnp.float32(1.0)
        if self.log_grad_norm:
            # pre-clip global grad norm (the thesis "norm during training"
            # track, plot_data.py:521-533; only computed when clipping is
            # on, where optax already pays for the reduction)
            metrics["G_grad_norm"] = optax.global_norm(grads)
        return (
            params_G, opt_state_G, state.params_D, state.opt_state_D,
            state.batch_stats_D, metrics,
        )

    def _d_branch(self, state, lr, hr, z, it, keys, w):
        # G eval, no dropout (reference :590-592); no grad flows through G
        # here, so the fused Pallas trunk is eligible
        fake = self._g_forward_nograd(state.params_G, lr, z)
        hr3 = hr[..., :3]
        grad_fn = jax.value_and_grad(self._d_loss, has_aux=True)
        (loss_D, (new_bs, _, _)), grads = grad_fn(
            state.params_D, state.batch_stats_D, hr3, fake, it, keys, True
        )
        updates, new_opt = self.opt_D.update(
            grads, state.opt_state_D, state.params_D
        )
        lr_t = self.lr_D(it)
        params_D = jax.tree.map(
            lambda p, u: p + u * lr_t, state.params_D, updates
        )
        metrics = _zeros_loss_dict()
        metrics["D_train_loss"] = loss_D
        metrics["is_g_step"] = jnp.float32(0.0)
        if self.log_grad_norm:  # structure must match the G branch's
            metrics["G_grad_norm"] = jnp.float32(0.0)
        return (
            state.params_G, state.opt_state_G, params_D, new_opt, new_bs,
            metrics,
        )

    def _train_step(self, state: GANTrainState, lr, hr, z,
                    weights=None, augment: bool = False):
        w = weights or self.default_weights
        it = state.it + 1
        keys = self._split_keys(state.rng)
        if augment:
            lr, hr, z = augment_batch(keys["aug"], lr, hr, z)

        params_D_frozen = state.params_D_frozen
        if self.use_feature_D:
            refresh = (it % self.feature_D_update_period) == 0
            params_D_frozen = jax.tree.map(
                lambda cur, froz: jnp.where(refresh, cur, froz),
                state.params_D, state.params_D_frozen,
            )
            state = state.replace(params_D_frozen=params_D_frozen)

        if self.d_g_train_ratio == 0:
            outs = self._g_branch(state, lr, hr, z, it, keys, w)
        else:
            train_period = it // self.d_g_train_period
            is_g = (train_period % (self.d_g_train_ratio + 1)) == 0
            outs = jax.lax.cond(
                is_g,
                lambda op: self._g_branch(*op),
                lambda op: self._d_branch(*op),
                (state, lr, hr, z, it, keys, w),
            )
        params_G, opt_G, params_D, opt_D, bs_D, metrics = outs
        params_G_ema = state.params_G_ema
        if self.ema_decay > 0.0 and params_G_ema is not None:
            # branchless: moves only on G steps (is_g_step is 0.0 on D
            # steps, where params_G is unchanged anyway).
            # Warmup ramp d_eff = min(d, (1+n)/(10+n)) over the G-step
            # count n: a fixed decay keeps ~d^n of the RANDOM INIT in the
            # slot — measured 5% init contamination after the 6k compressed
            # run (3000 G steps at d=0.999), costing 3.5 dB of test PSNR
            # vs the raw weights (docs/evidence/milestone6k_test.md). The
            # ramp follows the live weights early and anneals to the
            # configured horizon, so short/compressed schedules stay clean.
            if self.d_g_train_ratio == 0:
                n_g = it  # every step is a G step
            else:
                # closed-form count of G steps among steps 1..it under the
                # block alternation (period P, 1 G block per (ratio+1)):
                # steps s in [0,it] with (s//P) % r1 == 0, minus s=0
                r1 = self.d_g_train_ratio + 1
                p = self.d_g_train_period
                blk = it // p
                pos = it % p
                n_g = (
                    (blk + r1 - 1) // r1 * p
                    + jnp.where((blk % r1) == 0, pos + 1, 0)
                    - 1
                )
            n = jnp.maximum(n_g, 1).astype(jnp.float32)
            d_eff = jnp.minimum(self.ema_decay, (1.0 + n) / (10.0 + n))
            a = (1.0 - d_eff) * metrics["is_g_step"]
            params_G_ema = jax.tree.map(
                lambda e, p: e + a * (p.astype(e.dtype) - e),
                params_G_ema, params_G,
            )
        new_state = GANTrainState(
            params_G=params_G,
            params_D=params_D,
            batch_stats_D=bs_D,
            params_D_frozen=params_D_frozen,
            opt_state_G=opt_G,
            opt_state_D=opt_D,
            it=it,
            rng=keys["next"],
            params_G_ema=params_G_ema,
        )
        metrics["lr_G"] = self.lr_G(it)
        return new_state, metrics

    def train_step(self, state, lr, hr, z, augment: bool = False,
                   weights=None):
        return self._jit_train_step(state, lr, hr, z, weights,
                                    augment=augment)

    # ---------------------------------------------------------- chunked step
    def _train_chunk(self, state, full, zraw, key, *, n_steps, batch_size,
                     patch, patch_y, cf, enable_slicing, augment):
        """``n_steps`` train steps in ONE compiled program (lax.scan), each
        slicing its own batch from the device-resident volumes
        (data/device_data.py:slice_batch). Removes the per-iteration
        dispatch round-trips that dominate end-to-end rate over
        remote-tunnel runtimes (measured: 2 dispatches/it ≈ +0.12 s/it on
        top of the 0.28 s/it compute step). Batch keys are
        ``fold_in(key, it)`` — absolute-iteration based, so resume
        produces the same stream regardless of chunk boundaries.
        Returns (state, last step's metrics) — the caller aligns chunk
        ends with its log/val boundaries."""
        from gan_sr_wind_field_tpu.data.device_data import slice_batch

        def body(st, _):
            k = jax.random.fold_in(key, st.it)
            lr, hr, z = slice_batch(
                full, zraw, k, batch_size=batch_size, patch=patch,
                patch_y=patch_y, cf=cf, enable_slicing=enable_slicing,
            )
            return self._train_step(st, lr, hr, z, None, augment=augment)

        state, ms = jax.lax.scan(body, state, None, length=n_steps)
        return state, jax.tree.map(lambda x: x[-1], ms)

    def train_chunk(self, state, full, zraw, key, **kw):
        return self._jit_train_chunk(state, full, zraw, key, **kw)

    # ------------------------------------------------------------- val step
    def _val_step(self, state: GANTrainState, lr, hr, z, rng, weights=None):
        """Validation losses + metrics (reference validation path :594-618).

        Returns (metrics dict, new_batch_stats): the reference's D train-mode
        no-grad forward updates BN running stats during validation — a quirk
        we replicate; callers may write new_batch_stats back into the state.
        ``rng`` should differ per validation batch (e.g. fold_in of the batch
        index) so noise draws are independent like the reference's global RNG.
        """
        it = state.it
        keys = self._split_keys(rng)
        hr3 = hr[..., :3]

        w = weights or self.default_weights
        _, (losses, fake) = self._g_losses(
            state.params_G, state, lr, hr, z, it, keys, train=False, w=w
        )
        metrics = {f"G_val_{k}": v for k, v in losses.items()}

        new_bs = state.batch_stats_D
        if self.use_adv:
            loss_D, (new_bs, y_pred, fake_y_pred) = self._d_loss(
                state.params_D, state.batch_stats_D, hr3, fake, it, keys,
                update_stats=True,
            )
            metrics["D_val_loss"] = loss_D
            metrics["D_pred_HR"] = jnp.mean(jax.nn.sigmoid(y_pred))
            metrics["D_pred_SR"] = jnp.mean(jax.nn.sigmoid(fake_y_pred))
        else:
            metrics["D_val_loss"] = jnp.float32(0.0)
            metrics["D_pred_HR"] = jnp.float32(0.0)
            metrics["D_pred_SR"] = jnp.float32(0.0)

        trilinear = upsample_trilinear_xy(lr[..., :3], self.cfg.scale)
        metrics["val_PSNR"] = psnr_fn(hr3, fake)
        metrics["Trilinear_PSNR"] = psnr_fn(hr3, trilinear)
        if self.pixel_criterion == "l2":
            tl_pix = jnp.mean((hr3 - trilinear) ** 2)
        else:
            tl_pix = jnp.mean(jnp.abs(hr3 - trilinear))
        metrics["trilinear_pix_loss"] = tl_pix
        metrics["pix_loss_unscaled"] = jnp.where(
            w["pix"] != 0.0, losses["pix"] / jnp.maximum(w["pix"], 1e-30),
            losses["pix"],
        )
        return metrics, new_bs

    def val_step(self, state, lr, hr, z, rng=None, weights=None):
        if rng is None:
            rng = state.rng
        return self._jit_val_step(state, lr, hr, z, rng, weights)
