"""Typed configuration system.

Covers every key of the reference INI config system
(reference: config/config.py:18-396) as frozen-ish dataclasses with the same
section/key names, so reference .ini files load unchanged. Adds TPU-specific
knobs (dtype policy, mesh shape) that the reference never had.

Round-trips: ``Config.from_ini(path)`` -> ``cfg.as_ini()`` reproduces an
equivalent INI (reference: config/config.py:361-381 ``asINI``).
"""

from __future__ import annotations

import ast
import dataclasses
import io
from configparser import ConfigParser
from dataclasses import dataclass, field
from typing import List, Optional


def safe_list_from_string(value, target_type=int) -> list:
    """Parse a python-literal list from an INI string.

    Mirrors the tolerant semantics of the reference parser
    (config/config.py:384-396): bad input -> [], scalar -> [scalar].
    """
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return [target_type(v) for v in value]
    try:
        parsed = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return []
    if parsed is None:
        return []
    if not isinstance(parsed, list):
        return [target_type(parsed)]
    return [target_type(v) for v in parsed]


def _get(section, key, cast, default):
    """Read ``key`` from a configparser section with a typed cast + default."""
    if section is None or key not in section or section.get(key) in (None, ""):
        return default
    raw = section.get(key)
    # strip inline comments configparser leaves behind when inline_comment
    # prefixes are not configured (the reference inis use '#' inline)
    if isinstance(raw, str):
        raw = raw.split("#", 1)[0].split(";", 1)[0].strip()
        if raw == "":
            return default
    if cast is bool:
        return str(raw).strip().lower() in ("1", "true", "yes", "on")
    if cast is list:
        return safe_list_from_string(raw)
    try:
        return cast(raw)
    except (TypeError, ValueError):
        return default


def _opt_str(section, key):
    v = _get(section, key, str, None)
    if v is None:
        return None
    if v.lower() in ("none", "null", ""):
        return None
    return v


@dataclass
class GANConfig:
    """[GAN] section — dataset geometry and input-channel toggles.

    Mirrors reference config/config.py:30-58.
    """

    include_pressure: bool = True
    include_z_channel: bool = True
    include_above_ground_channel: bool = False
    number_of_z_layers: int = 10
    conv_mode: str = "3D"
    start_date: List[int] = field(default_factory=lambda: [2018, 4, 1])
    end_date: List[int] = field(default_factory=lambda: [2018, 4, 4])
    interpolate_z: bool = False
    use_D_feature_extractor_cost: bool = False
    enable_slicing: bool = False
    slice_size: int = 64


@dataclass
class EnvConfig:
    """[ENV] section — run folders, seeds, checkpoint load paths.

    Mirrors reference config/config.py:61-81.
    """

    root_path: str = "./runs_root"
    log_subpath: str = "/log"
    tensorboard_subpath: str = "/tensorboard_log"
    runs_subpath: str = "/runs"
    generator_load_path: Optional[str] = None
    discriminator_load_path: Optional[str] = None
    state_load_path: Optional[str] = None
    fixed_seed: int = 2001
    this_runs_folder: Optional[str] = None
    this_runs_tensorboard_log_folder: Optional[str] = None
    # TPU addition: where the on-disk hourly-sample cache lives
    data_root: str = "./data"


@dataclass
class GeneratorConfig:
    """[GENERATOR] section. Mirrors reference config/config.py:84-127."""

    norm_type: str = "none"
    act_type: str = "leakyrelu"
    layer_mode: str = "CNA"
    num_features: int = 128
    num_RRDB: int = 16
    num_RDB_convs: int = 5
    RDB_res_scaling: float = 0.2
    RRDB_res_scaling: float = 0.2
    in_num_ch: int = 3
    out_num_ch: int = 3
    RDB_growth_chan: int = 32
    hr_kern_size: int = 5
    weight_init_scale: float = 0.1
    lff_kern_size: int = 1
    conv_mode: str = "3D"
    use_mixed_precision: bool = True
    terrain_number_of_features: int = 16
    dropout_probability: float = 0.0
    max_norm: float = 1.0
    # TPU addition: rematerialise RRDBs in backward (memory/FLOP trade)
    use_remat: bool = True


@dataclass
class DiscriminatorConfig:
    """[DISCRIMINATOR] section. Mirrors reference config/config.py:130-152."""

    norm_type: str = "batch"
    act_type: str = "leakyrelu"
    layer_mode: str = "CNA"
    num_features: int = 32
    in_num_ch: int = 3
    feat_kern_size: int = 3
    weight_init_scale: float = 0.2
    conv_mode: str = "3D"
    use_mixed_precision: bool = True
    dropout_probability: float = 0.2


@dataclass
class FeatureExtractorConfig:
    """[FEATUREEXTRACTOR] section. Mirrors reference config/config.py:155-162.

    Dead surface in the reference too (`feature_extractor = None`,
    wind_field_GAN_3D.py:85) — kept for config-compatibility; the working
    feature-space loss is the D-feature path (use_D_feature_extractor_cost)."""

    low_level_feat_layer: int = 1
    high_level_feat_layer: int = 34


@dataclass
class DatasetConfig:
    """[DATASETTRAIN/VAL/TEST] sections. Mirrors config/config.py:164-195."""

    name: str = "default_dataset_name"
    mode: str = "downsampler"
    num_workers: int = 0
    batch_size: int = 16
    data_aug_flip: bool = True
    data_aug_rot: bool = True
    # Deterministic evaluation track (this framework's addition): disables
    # augmentation and fixes patch offsets for this split so repeated
    # sweeps are comparable. The reference keeps random augmentation on
    # validation (quirk-parity default False), which makes val PSNR swing
    # ~10 dB between sweeps — too noisy for ASHA decisions or for the
    # 33-41 dB band comparison.
    deterministic: bool = False


@dataclass
class TrainingConfig:
    """[TRAINING] section. Mirrors reference config/config.py:197-278."""

    resume_training_from_save: bool = False
    learning_rate_g: float = 1e-4
    learning_rate_d: float = 1e-4
    adam_weight_decay_g: float = 0.0
    adam_weight_decay_d: float = 0.0
    adam_beta1_g: float = 0.9
    adam_beta1_d: float = 0.9
    multistep_lr: bool = True
    multistep_lr_steps: List[int] = field(
        default_factory=lambda: [50000, 100000, 200000, 300000]
    )
    lr_gamma: float = 0.5
    train_eval_test_ratio: float = 0.8

    gan_type: str = "relativisticavg"
    adversarial_loss_weight: float = 5e-3
    d_g_train_ratio: int = 1
    d_g_train_period: int = 50

    pixel_criterion: str = "l1"
    pixel_loss_weight: float = 1e-1
    gradient_xy_loss_weight: float = 1e-1
    gradient_z_loss_weight: float = 1e-1
    divergence_loss_weight: float = 1e-1
    xy_divergence_loss_weight: float = 1e-1
    feature_D_loss_weight: float = 0.1
    feature_D_update_period: int = 1

    use_noisy_labels: bool = False
    use_one_sided_label_smoothing: bool = False
    flip_labels: bool = False
    use_instance_noise: bool = False

    niter: int = 25
    val_period: int = 2000
    save_model_period: int = 2000
    log_period: int = 100
    # TPU addition: keep only the last N checkpoints (0 = keep all, the
    # reference behaviour); a full GAN state is ~0.5 GB on disk
    keep_checkpoints: int = 0
    # TPU addition: "float32" (default) or "bfloat16_sr" — Adam moments in
    # bf16 with stochastic-rounding casts (ops/sr_cast.py), half the
    # optimizer HBM at unchanged expected trajectory
    optimizer_state_dtype: str = "float32"
    # documented fix (off by default for parity): the reference parses
    # generator.max_norm but its clip call is commented out
    # (wind_field_GAN_3D.py:458-459); enabling this applies global-norm
    # gradient clipping at max_norm in both optimizers
    use_grad_clipping: bool = False
    # TPU addition (off by default for parity): exponential moving average
    # of the generator weights, updated after each G optimizer step —
    # the classic ESRGAN-lineage serving-quality lever the reference
    # lacks. 0 disables; typical values 0.999-0.9999. When present in a
    # checkpoint, --use/--export/--serve prefer the EMA weights.
    g_ema_decay: float = 0.0
    # TPU addition (elastic recovery, train/watchdog.py): seconds without
    # a completed iteration before the watchdog SIGTERMs its own process
    # (graceful checkpoint+exit via the preemption handler; hard exit 86
    # if the runtime is fully dead so a supervisor relaunches from the
    # last checkpoint — scripts/supervise_train.py). 0 = off. Pick well
    # above one validation sweep + checkpoint save (300 s at cluster
    # geometry); remote compiles don't count (arms at the first step).
    stall_watchdog_s: float = 0.0


@dataclass
class ParallelConfig:
    """TPU-only section [PARALLEL]: device-mesh layout.

    No reference equivalent — the reference is strictly single-device
    (run.py:265-271); this is the SPMD upgrade.
    """

    data_parallel: int = -1  # -1 = all devices on the data axis
    tensor_parallel: int = 1
    # spatial (sequence-like) sharding of the x axis of full volumes
    spatial_parallel: int = 1


@dataclass
class Config:
    """Top-level config: [DEFAULT] keys + nested sections.

    Mirrors reference config/config.py:281-362 plus TPU additions
    (compute_dtype, parallel).
    """

    name: str = "default_name"
    model: str = "wind_field_GAN_3D"
    use_tensorboard_logger: bool = False
    scale: int = 4
    gpu_id: Optional[int] = None  # kept for INI parity; unused on TPU
    also_log_to_terminal: bool = True
    load_model_from_save: bool = False
    display_bar: bool = True
    # TPU additions
    compute_dtype: str = "bfloat16"  # conv/matmul dtype; params & loss stay f32
    param_dtype: str = "float32"
    # use the fused Pallas gradient stencil (ops/pallas/stencil.py, custom
    # VJP) inside the physics losses instead of the pure-XLA path
    use_pallas_stencil: bool = False
    # run no-grad G forwards (D train branch, validation SR, serving) through
    # the fused Pallas RRDB-trunk kernel (ops/pallas/rdb_trunk.py)
    use_fused_trunk: bool = False
    # run hr_conv0 as the channel-split Pallas head kernel
    # (ops/pallas/hr_head.py) on the fused forward paths; requires
    # use_fused_trunk (the flax/GSPMD path keeps XLA)
    use_pallas_head: bool = False
    # same, but ONLY on the no-grad forward (D steps / inference): the
    # kernel regresses inside the G-train graph but the inference graph
    # schedules differently (see CLAUDE.md perf facts)
    use_pallas_head_nograd: bool = False
    # hr_conv0 forward as full-lane main conv + tap-stacked remainder
    # (ops/tap_conv.py:conv3d_split_out) on the NO-GRAD forwards (D steps,
    # validation SR, serving) — pure-XLA reassociation, measured D step
    # 160.8→156.2 ms on v5e; regresses inside the G-train graph (→ off
    # there), same scheduling lesson as use_pallas_head
    split_hr_out_nograd: bool = True
    # XLA:TPU scoped-VMEM budget override (KiB) applied to the GAN's jitted
    # steps via jit(compiler_options=...). 0 = compiler default (~16 MiB).
    # 65536 (64 MiB) measured 4%/8% faster G/D steps on v5e (see CLAUDE.md);
    # ignored on CPU backends, where the flag doesn't exist.
    xla_scoped_vmem_limit_kib: int = 0
    # upload the full training split to HBM once and cut patches with a
    # jitted on-device slicer (data/device_data.py) instead of streaming
    # every batch host→device — removes the per-step H2D transfer, which
    # dominates over remote-tunnel runtimes (measured 2.5 s/it vs the
    # 0.28 s/it compute step). Default off: the host path keeps the
    # reference's epoch-permutation semantics and the pinned CPU golden
    # trajectories. Single-process only (pods keep the host path).
    device_resident_data: bool = False
    # with device_resident_data: run this many train steps per compiled
    # dispatch (lax.scan with in-graph batch slicing). 1 = one dispatch
    # per step. Values >1 amortize the tunnel's per-dispatch round trip;
    # the loop clamps chunks to log/val/save boundaries (single steps
    # fill the remainder), so any value is safe. MEASURED NEGATIVE at the
    # flagship batch-32 geometry (0.6-0.8 vs 2.52 it/s — the scan's
    # loop-carried state pushes the near-ceiling HBM into a slower
    # buffer-assignment regime; docs/PERF.md); keep 1 there, use >1 only
    # for HBM-light workloads. SIGTERM is observed between dispatches, so
    # preemption response latency grows by up to steps_per_dispatch steps.
    steps_per_dispatch: int = 1

    env: EnvConfig = field(default_factory=EnvConfig)
    gan_config: GANConfig = field(default_factory=GANConfig)
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    feature_extractor: FeatureExtractorConfig = field(
        default_factory=FeatureExtractorConfig
    )
    dataset_train: Optional[DatasetConfig] = field(default_factory=DatasetConfig)
    dataset_val: Optional[DatasetConfig] = field(default_factory=DatasetConfig)
    dataset_test: Optional[DatasetConfig] = field(default_factory=DatasetConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    is_train: bool = False
    is_test: bool = False
    is_use: bool = False
    is_param_search: bool = False
    is_download: bool = False
    slurm_array_id: int = 1

    # ------------------------------------------------------------------ load
    @classmethod
    def from_ini(cls, ini_path: str) -> "Config":
        parser = ConfigParser(allow_no_value=True, inline_comment_prefixes=("#", ";"))
        with open(ini_path) as f:
            parser.read_string(f.read())
        return cls.from_parser(parser)

    @classmethod
    def from_ini_string(cls, text: str) -> "Config":
        parser = ConfigParser(allow_no_value=True, inline_comment_prefixes=("#", ";"))
        parser.read_string(text)
        return cls.from_parser(parser)

    @classmethod
    def from_parser(cls, parser: ConfigParser) -> "Config":
        cfg = cls()
        base = parser["DEFAULT"] if parser.defaults() else None
        if base is not None:
            cfg.name = _get(base, "name", str, cfg.name)
            cfg.model = _get(base, "model", str, cfg.model)
            cfg.use_tensorboard_logger = _get(
                base, "use_tensorboard_logger", bool, cfg.use_tensorboard_logger
            )
            cfg.scale = _get(base, "scale", int, cfg.scale)
            gpu = _get(base, "gpu_id", str, None)
            cfg.gpu_id = None if gpu is None or str(gpu).lower() == "none" else int(gpu)
            cfg.also_log_to_terminal = _get(
                base, "also_log_to_terminal", bool, cfg.also_log_to_terminal
            )
            cfg.load_model_from_save = _get(
                base, "load_model_from_save", bool, cfg.load_model_from_save
            )
            cfg.display_bar = _get(base, "display_bar", bool, cfg.display_bar)
            cfg.compute_dtype = _get(base, "compute_dtype", str, cfg.compute_dtype)
            cfg.param_dtype = _get(base, "param_dtype", str, cfg.param_dtype)
            cfg.use_pallas_stencil = _get(
                base, "use_pallas_stencil", bool, cfg.use_pallas_stencil
            )
            cfg.use_pallas_head = _get(
                base, "use_pallas_head", bool, cfg.use_pallas_head
            )
            cfg.use_pallas_head_nograd = _get(
                base, "use_pallas_head_nograd", bool,
                cfg.use_pallas_head_nograd,
            )
            cfg.use_fused_trunk = _get(
                base, "use_fused_trunk", bool, cfg.use_fused_trunk
            )
            cfg.split_hr_out_nograd = _get(
                base, "split_hr_out_nograd", bool, cfg.split_hr_out_nograd
            )
            cfg.xla_scoped_vmem_limit_kib = _get(
                base, "xla_scoped_vmem_limit_kib", int,
                cfg.xla_scoped_vmem_limit_kib,
            )
            cfg.device_resident_data = _get(
                base, "device_resident_data", bool, cfg.device_resident_data
            )
            cfg.steps_per_dispatch = _get(
                base, "steps_per_dispatch", int, cfg.steps_per_dispatch
            )

        def section(name):
            return parser[name] if parser.has_section(name) else None

        env = section("ENV")
        if env is not None:
            e = cfg.env
            e.root_path = _get(env, "root_path", str, e.root_path)
            e.log_subpath = _get(env, "log_subpath", str, e.log_subpath)
            e.tensorboard_subpath = _get(
                env, "tensorboard_subpath", str, e.tensorboard_subpath
            )
            e.runs_subpath = _get(env, "runs_subpath", str, e.runs_subpath)
            e.generator_load_path = _opt_str(env, "generator_load_path")
            e.discriminator_load_path = _opt_str(env, "discriminator_load_path")
            e.state_load_path = _opt_str(env, "state_load_path")
            e.fixed_seed = _get(env, "fixed_seed", int, e.fixed_seed)
            e.data_root = _get(env, "data_root", str, e.data_root)

        gan = section("GAN")
        if gan is not None:
            g = cfg.gan_config
            g.include_pressure = _get(gan, "include_pressure", bool, g.include_pressure)
            g.include_z_channel = _get(
                gan, "include_z_channel", bool, g.include_z_channel
            )
            g.include_above_ground_channel = _get(
                gan, "include_above_ground_channel", bool, g.include_above_ground_channel
            )
            g.number_of_z_layers = _get(
                gan, "number_of_z_layers", int, g.number_of_z_layers
            )
            g.conv_mode = _get(gan, "conv_mode", str, g.conv_mode)
            g.start_date = _get(gan, "start_date", list, g.start_date)
            g.end_date = _get(gan, "end_date", list, g.end_date)
            g.interpolate_z = _get(gan, "interpolate_z", bool, g.interpolate_z)
            g.use_D_feature_extractor_cost = _get(
                gan, "use_D_feature_extractor_cost", bool, g.use_D_feature_extractor_cost
            )
            g.enable_slicing = _get(gan, "enable_slicing", bool, g.enable_slicing)
            g.slice_size = _get(gan, "slice_size", int, g.slice_size)

        gen = section("GENERATOR")
        if gen is not None:
            G = cfg.generator
            G.norm_type = _get(gen, "norm_type", str, G.norm_type)
            G.act_type = _get(gen, "act_type", str, G.act_type)
            G.layer_mode = _get(gen, "layer_mode", str, G.layer_mode)
            G.num_features = _get(gen, "num_features", int, G.num_features)
            G.num_RRDB = _get(gen, "num_RRDB", int, G.num_RRDB)
            G.num_RDB_convs = _get(gen, "num_RDB_convs", int, G.num_RDB_convs)
            G.RDB_res_scaling = _get(gen, "RDB_res_scaling", float, G.RDB_res_scaling)
            G.RRDB_res_scaling = _get(
                gen, "RRDB_res_scaling", float, G.RRDB_res_scaling
            )
            G.in_num_ch = _get(gen, "in_num_ch", int, G.in_num_ch)
            G.out_num_ch = _get(gen, "out_num_ch", int, G.out_num_ch)
            G.RDB_growth_chan = _get(gen, "RDB_growth_chan", int, G.RDB_growth_chan)
            G.hr_kern_size = _get(gen, "hr_kern_size", int, G.hr_kern_size)
            G.weight_init_scale = _get(
                gen, "weight_init_scale", float, G.weight_init_scale
            )
            G.lff_kern_size = _get(gen, "lff_kern_size", int, G.lff_kern_size)
            G.conv_mode = _get(gen, "conv_mode", str, G.conv_mode)
            G.use_mixed_precision = _get(
                gen, "use_mixed_precision", bool, G.use_mixed_precision
            )
            G.terrain_number_of_features = _get(
                gen, "terrain_number_of_features", int, G.terrain_number_of_features
            )
            G.dropout_probability = _get(
                gen, "dropout_probability", float, G.dropout_probability
            )
            G.max_norm = _get(gen, "max_norm", float, G.max_norm)
            G.use_remat = _get(gen, "use_remat", bool, G.use_remat)

        disc = section("DISCRIMINATOR")
        if disc is not None:
            D = cfg.discriminator
            D.norm_type = _get(disc, "norm_type", str, D.norm_type)
            D.act_type = _get(disc, "act_type", str, D.act_type)
            D.layer_mode = _get(disc, "layer_mode", str, D.layer_mode)
            D.num_features = _get(disc, "num_features", int, D.num_features)
            D.in_num_ch = _get(disc, "in_num_ch", int, D.in_num_ch)
            D.feat_kern_size = _get(disc, "feat_kern_size", int, D.feat_kern_size)
            D.weight_init_scale = _get(
                disc, "weight_init_scale", float, D.weight_init_scale
            )
            D.conv_mode = _get(disc, "conv_mode", str, D.conv_mode)
            D.use_mixed_precision = _get(
                disc, "use_mixed_precision", bool, D.use_mixed_precision
            )
            D.dropout_probability = _get(
                disc, "dropout_probability", float, D.dropout_probability
            )

        fe = section("FEATUREEXTRACTOR")
        if fe is not None:
            F = cfg.feature_extractor
            F.low_level_feat_layer = _get(
                fe, "low_level_feat_layer", int, F.low_level_feat_layer
            )
            F.high_level_feat_layer = _get(
                fe, "high_level_feat_layer", int, F.high_level_feat_layer
            )

        tr = section("TRAINING")
        if tr is not None:
            T = cfg.training
            T.resume_training_from_save = _get(
                tr, "resume_training_from_save", bool, T.resume_training_from_save
            )
            T.learning_rate_g = _get(tr, "learning_rate_g", float, T.learning_rate_g)
            T.learning_rate_d = _get(tr, "learning_rate_d", float, T.learning_rate_d)
            T.adam_weight_decay_g = _get(
                tr, "adam_weight_decay_g", float, T.adam_weight_decay_g
            )
            T.adam_weight_decay_d = _get(
                tr, "adam_weight_decay_d", float, T.adam_weight_decay_d
            )
            T.adam_beta1_g = _get(tr, "adam_beta1_g", float, T.adam_beta1_g)
            T.adam_beta1_d = _get(tr, "adam_beta1_d", float, T.adam_beta1_d)
            T.multistep_lr = _get(tr, "multistep_lr", bool, T.multistep_lr)
            T.multistep_lr_steps = _get(
                tr, "multistep_lr_steps", list, T.multistep_lr_steps
            )
            T.lr_gamma = _get(tr, "lr_gamma", float, T.lr_gamma)
            T.train_eval_test_ratio = _get(
                tr, "train_eval_test_ratio", float, T.train_eval_test_ratio
            )
            T.gan_type = _get(tr, "gan_type", str, T.gan_type)
            T.adversarial_loss_weight = _get(
                tr, "adversarial_loss_weight", float, T.adversarial_loss_weight
            )
            T.d_g_train_ratio = _get(tr, "d_g_train_ratio", int, T.d_g_train_ratio)
            T.d_g_train_period = _get(tr, "d_g_train_period", int, T.d_g_train_period)
            T.pixel_criterion = _get(tr, "pixel_criterion", str, T.pixel_criterion)
            T.pixel_loss_weight = _get(
                tr, "pixel_loss_weight", float, T.pixel_loss_weight
            )
            T.gradient_xy_loss_weight = _get(
                tr, "gradient_xy_loss_weight", float, T.gradient_xy_loss_weight
            )
            T.gradient_z_loss_weight = _get(
                tr, "gradient_z_loss_weight", float, T.gradient_z_loss_weight
            )
            T.divergence_loss_weight = _get(
                tr, "divergence_loss_weight", float, T.divergence_loss_weight
            )
            T.xy_divergence_loss_weight = _get(
                tr, "xy_divergence_loss_weight", float, T.xy_divergence_loss_weight
            )
            T.feature_D_loss_weight = _get(
                tr, "feature_D_loss_weight", float, T.feature_D_loss_weight
            )
            T.feature_D_update_period = _get(
                tr, "feature_D_update_period", int, T.feature_D_update_period
            )
            T.use_noisy_labels = _get(tr, "use_noisy_labels", bool, T.use_noisy_labels)
            T.use_one_sided_label_smoothing = _get(
                tr,
                "use_one_sided_label_smoothing",
                bool,
                T.use_one_sided_label_smoothing,
            )
            T.flip_labels = _get(tr, "flip_labels", bool, T.flip_labels)
            T.use_instance_noise = _get(
                tr, "use_instance_noise", bool, T.use_instance_noise
            )
            T.niter = _get(tr, "niter", int, T.niter)
            T.val_period = _get(tr, "val_period", int, T.val_period)
            T.save_model_period = _get(tr, "save_model_period", int, T.save_model_period)
            T.keep_checkpoints = _get(tr, "keep_checkpoints", int, T.keep_checkpoints)
            T.optimizer_state_dtype = _get(
                tr, "optimizer_state_dtype", str, T.optimizer_state_dtype
            )
            T.use_grad_clipping = _get(
                tr, "use_grad_clipping", bool, T.use_grad_clipping
            )
            T.g_ema_decay = _get(tr, "g_ema_decay", float, T.g_ema_decay)
            T.stall_watchdog_s = _get(
                tr, "stall_watchdog_s", float, T.stall_watchdog_s
            )
            T.log_period = _get(tr, "log_period", int, T.log_period)

        for sec_name, attr in (
            ("DATASETTRAIN", "dataset_train"),
            ("DATASETVAL", "dataset_val"),
            ("DATASETTEST", "dataset_test"),
        ):
            sec = section(sec_name)
            if sec is None:
                setattr(cfg, attr, None)
                continue
            ds = DatasetConfig()
            ds.name = _get(sec, "name", str, ds.name)
            ds.mode = _get(sec, "mode", str, ds.mode)
            ds.num_workers = _get(sec, "num_workers", int, ds.num_workers)
            ds.batch_size = _get(sec, "batch_size", int, ds.batch_size)
            ds.data_aug_flip = _get(sec, "data_aug_flip", bool, ds.data_aug_flip)
            ds.data_aug_rot = _get(sec, "data_aug_rot", bool, ds.data_aug_rot)
            ds.deterministic = _get(sec, "deterministic", bool, ds.deterministic)
            setattr(cfg, attr, ds)

        par = section("PARALLEL")
        if par is not None:
            P = cfg.parallel
            P.data_parallel = _get(par, "data_parallel", int, P.data_parallel)
            P.tensor_parallel = _get(par, "tensor_parallel", int, P.tensor_parallel)
            P.spatial_parallel = _get(par, "spatial_parallel", int, P.spatial_parallel)

        return cfg

    # ------------------------------------------------------------------ save
    def as_ini(self) -> str:
        """Serialise back to INI text (reference: config/config.py:361-381)."""
        parser = ConfigParser(allow_no_value=True)

        def dump(section: str, obj) -> None:
            parser.add_section(section) if section != "DEFAULT" else None
            for f_ in dataclasses.fields(obj):
                v = getattr(obj, f_.name)
                if dataclasses.is_dataclass(v) or f_.name in (
                    "env",
                    "gan_config",
                    "generator",
                    "discriminator",
                    "training",
                    "parallel",
                    "dataset_train",
                    "dataset_val",
                    "dataset_test",
                ):
                    continue
                parser.set(section, f_.name, "" if v is None else str(v))

        dump("DEFAULT", self)
        dump("ENV", self.env)
        dump("GAN", self.gan_config)
        dump("GENERATOR", self.generator)
        dump("DISCRIMINATOR", self.discriminator)
        dump("FEATUREEXTRACTOR", self.feature_extractor)
        dump("TRAINING", self.training)
        dump("PARALLEL", self.parallel)
        for name, ds in (
            ("DATASETTRAIN", self.dataset_train),
            ("DATASETVAL", self.dataset_val),
            ("DATASETTEST", self.dataset_test),
        ):
            if ds is not None:
                dump(name, ds)
        buf = io.StringIO()
        parser.write(buf)
        return buf.getvalue()

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.as_ini())

    # ------------------------------------------------------------- derived
    @property
    def lr_num_channels(self) -> int:
        """Channels of the LR input tensor.

        uvw (3) + pressure + z-channel(s); boolean arithmetic mirrors
        reference wind_field_GAN_3D.py:92-96.
        """
        g = self.gan_config
        return (
            self.generator.in_num_ch
            + int(g.include_pressure)
            + int(g.include_z_channel)
            + int(g.include_above_ground_channel)
        )


def load_config(ini_path: str, **overrides) -> Config:
    cfg = Config.from_ini(ini_path)
    for k, v in overrides.items():
        if not hasattr(cfg, k):
            raise AttributeError(f"Config has no field {k!r}")
        setattr(cfg, k, v)
    return cfg
