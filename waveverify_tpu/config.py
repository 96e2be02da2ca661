"""Typed configuration for waveverify_tpu.

Replaces the reference's argbind+YAML soup with frozen dataclasses that are
hashable (so they can be static fields of jitted Flax modules), while still
ingesting the reference's `conf/base.yml` schema — both nested
(``Generator: {sample_rate: ...}``) and flat (``Generator.sample_rate: ...``)
key styles are accepted (reference waveverify/config.py:183-256).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import yaml

# ---------------------------------------------------------------------------
# Model configs (defaults == conf/base.yml == reference defaults)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GeneratorConfig:
    """Hyper-parameters of the FiLM-conditioned SEANet generator
    (reference model/generator.py:48-243, conf/base.yml:5-45)."""

    sample_rate: int = 16000
    channels_audio: int = 1
    dimension: int = 128
    msg_dimension: int = 16
    channels_enc: int = 64
    channels_dec: int = 96
    n_fft_base: int = 64
    n_residual_enc: int = 2
    n_residual_dec: int = 3
    res_scale_enc: float = 0.5773502691896258
    res_scale_dec: float = 0.5773502691896258
    strides: Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_alpha: float = 1.0
    norm: str = "weight_norm"
    kernel_size: int = 5
    last_kernel_size: int = 5
    residual_kernel_size: int = 5
    dilation_base: int = 1
    skip: str = "identity"
    final_activation: Optional[str] = "Tanh"
    act_all: bool = False
    expansion: int = 1
    groups: int = -1
    encoder_l2norm: bool = True
    bias: bool = False
    spec: str = "stft"
    spec_layer: str = "1x1_zero"
    spec_compression: str = "log"
    # NOTE: the reference accepts spec_learnable but never forwards it to the
    # encoder (reference model/generator.py:95 vs :177-209), so the effective
    # value is always False. We reproduce that behavior; flip
    # `spec_learnable_effective` to honor the flag.
    spec_learnable: bool = True
    spec_learnable_effective: bool = False
    # FiLM gamma-layer bias init. 0.0 = reference init (modulated bands
    # start scaled by ~0); 1.0 starts from identity-like modulation, which
    # accelerates message-channel formation (training-side improvement,
    # does not affect converted-checkpoint inference).
    film_gamma_bias: float = 0.0
    # Message-embedding mode: "reference" = learned MLP on {0,1} bits
    # (reference seanet.py:831-839, converted-checkpoint parity);
    # "carrier" = +/-1 bits + fixed orthonormal per-bit carrier added to the
    # MLP output, making every bit's channel immune to weight-decay collapse
    # (training-side improvement; see modules/seanet.py:_msg_embed).
    msg_mode: str = "reference"
    msg_carrier_gain: float = 1.0
    # Gain-space carrier (training-side improvement, default off): inject a
    # fixed orthogonal +/-1 signature per bit DIRECTLY into the FiLM
    # gamma/beta slots (Hadamard rows over the scales x bands x {gamma,beta}
    # grid). The embedding-space carrier above still passes through
    # near-zero-init Dense(1) projections, so per-bit audio amplitudes are
    # set by random projection conditioning — measured at step 32k, only the
    # ~5 best-conditioned bits formed a decodable channel. The gain-space
    # carrier gives every bit an equal-power, all-band, mutually-orthogonal
    # signature by construction (see modules/seanet.py:_film_carrier).
    film_carrier_gain: float = 0.0
    # Latent-space carrier (training-side improvement, default off): add a
    # fixed orthonormal per-bit direction to the ENCODER OUTPUT latent,
    # scaled by `gain * rms(latent)` (stop-gradient). Rationale: measured at
    # step 33k, the audio-domain Jacobian of the FiLM gain slots is
    # effectively rank-~2, so even an equal-power orthogonal gain-space
    # carrier leaves half the bits with ~zero audio signature (Hadamard sign
    # sums over the dominant slots cancel). The decoder's Jacobian over its
    # own input latent is well-conditioned by construction — it is trained
    # to synthesize audio from every latent direction — so latent-space
    # signatures give every bit a comparable audio-domain channel
    # (models/generator.py).
    latent_carrier_gain: float = 0.0
    pad_mode: str = "constant"
    causal: bool = True
    zero_init: bool = False
    inout_norm: bool = True
    nbits: int = 16
    embedding_dim: int = 64
    embedding_layers: int = 2
    freq_bands: int = 4

    @property
    def hop_length(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out


@dataclass(frozen=True)
class DetectorConfig:
    """Reference model/detector.py:82-224, conf/base.yml:81-112."""

    sample_rate: int = 16000
    channels_audio: int = 1
    dimension: int = 128
    channels_enc: int = 64
    n_fft_base: int = 64
    n_residual_enc: int = 2
    res_scale_enc: float = 0.5773502691896258
    strides: Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_alpha: float = 1.0
    norm: str = "weight_norm"
    kernel_size: int = 5
    last_kernel_size: int = 5
    residual_kernel_size: int = 5
    dilation_base: int = 1
    skip: str = "identity"
    act_all: bool = False
    expansion: int = 1
    groups: int = -1
    encoder_l2norm: bool = True
    bias: bool = False
    spec: str = "stft"
    spec_compression: str = "log"
    pad_mode: str = "constant"
    causal: bool = True
    zero_init: bool = False
    inout_norm: bool = True
    output_dim: int = 32
    nbits: int = 16

    @property
    def hop_length(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out


@dataclass(frozen=True)
class LocatorConfig:
    """Reference model/locator.py:46-188, conf/base.yml:48-79."""

    sample_rate: int = 16000
    channels_audio: int = 1
    dimension: int = 64
    channels_enc: int = 32
    n_fft_base: int = 64
    n_residual_enc: int = 1
    res_scale_enc: float = 0.5773502691896258
    strides: Tuple[int, ...] = (8, 4)
    activation: str = "ELU"
    activation_alpha: float = 1.0
    norm: str = "weight_norm"
    kernel_size: int = 5
    last_kernel_size: int = 5
    residual_kernel_size: int = 5
    dilation_base: int = 1
    skip: str = "identity"
    act_all: bool = False
    expansion: int = 1
    groups: int = -1
    encoder_l2norm: bool = True
    bias: bool = False
    spec: str = "stft"
    spec_compression: str = "log"
    pad_mode: str = "constant"
    causal: bool = True
    zero_init: bool = False
    inout_norm: bool = True
    output_dim: int = 32
    nbits: int = 16

    @property
    def hop_length(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out


@dataclass(frozen=True)
class DiscriminatorConfig:
    """Reference model/discriminator.py:362-410, conf/base.yml:115-125."""

    sample_rate: int = 16000
    rates: Tuple[int, ...] = ()
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)
    bands: Tuple[Tuple[float, float], ...] = (
        (0.0, 0.1),
        (0.1, 0.25),
        (0.25, 0.5),
        (0.5, 0.75),
        (0.75, 1.0),
    )


@dataclass(frozen=True)
class LossConfig:
    """Loss weights and spectral-loss settings (conf/base.yml:141-162)."""

    lambda_waveform: float = 1000.0
    lambda_mel: float = 20.0
    lambda_stft: float = 10.0
    lambda_adv_gen: float = 40.0
    lambda_loc: float = 100.0
    lambda_dec: float = 10000.0
    stft_window_lengths: Tuple[int, ...] = (2048, 512)
    mel_n_mels: Tuple[int, ...] = (5, 10, 20, 40, 80, 160, 320)
    mel_window_lengths: Tuple[int, ...] = (32, 64, 128, 256, 512, 1024, 2048)
    mel_pow: float = 1.0
    mel_clamp_eps: float = 1e-5
    mel_mag_weight: float = 0.0
    gp_weight: float = 10.0
    # Perceptual-loss warmup (TPU-build training accelerator, OFF by
    # default = exact reference weighting). When warmup_steps > 0 the
    # perceptual weights (waveform/mel/stft/adv) are scaled by
    # warmup_init_scale^(1 - step/warmup_steps): the generator first learns
    # a loud, decodable watermark (the decoding/localization weights stay
    # full), then the ramp squeezes it imperceptible. Cuts the BER-collapse
    # phase from the reference's several-100k-step schedule to O(10k).
    warmup_steps: int = 0
    warmup_init_scale: float = 0.01
    # BER gate for the ramp (0 = off -> step-indexed ramp above). When > 0
    # the ramp's progress advances only while the attacked-path train-BER
    # EMA is <= the gate (host-controlled; train/loop.py BerGatedRamp):
    # the watermark stays loud until decoding works and the squeeze pauses
    # automatically whenever it starts breaking decoding. Measured: the
    # fixed ramp undid decoding progress as it hit full weight (val BER
    # 0.30 -> 0.37 while SI-SNR climbed 5.6 -> 10 dB).
    warmup_ber_gate: float = 0.0
    # Discriminator cadence while the BER-gated ramp is CLOSED (progress
    # 0): train the discriminator (and compute the adversarial generator
    # terms) only every N-th step. While the adversarial weight sits at
    # init_scale the ensemble + second-order gradient penalty is wasted
    # device time; once the ramp starts squeezing the cadence returns to
    # every step. 1 = reference parity (always). Requires warmup_ber_gate.
    warmup_disc_every: int = 1
    # Alternating optimization while the BER-gated ramp is CLOSED: each
    # period of warmup_alt_period steps freezes the generator (detector +
    # locator keep training) for the first 1 - warmup_alt_gen_frac of the
    # period, then updates it for the tail. Det-phase-first: the run opens
    # with the detector learning the stationary init-time code before the
    # generator ever moves. Breaks the symmetric sign-flip
    # equilibrium where generator and detector invert a bit's convention in
    # lockstep every step — measured: individual bits pinned at 0.0 accuracy
    # for 4k+ steps while mean BER plateaued. 0 = off (reference parity:
    # joint updates every step). Requires warmup_ber_gate; once the ramp
    # starts squeezing, joint updates resume every step.
    warmup_alt_period: int = 0
    warmup_alt_gen_frac: float = 0.25
    # Stationary-carrier freeze (VERDICT r2 priority 1b). When > 0 the
    # generator's message-path parameters (module names starting with
    # ``msg_`` / ``film_`` — the carrier projections) receive ZERO updates
    # until the train-BER EMA first reaches the gate, then unfreeze for the
    # rest of the run (one-way host-side latch in BerGatedRamp, fed to the
    # step as a traced 0/1 scalar — no recompiles). The bit->pattern code
    # is frozen at its init-time (Hadamard-carrier) value so the detector
    # learns a STATIONARY code: the generator side of the sign-flip
    # lockstep (6/16 bits decoded with inverted polarity on the r3 run,
    # scripts/probe_bits.py) is removed entirely during channel formation.
    # The rest of the generator keeps training (residual shaping). NOTE:
    # the latch compares against the same EMA the fx latch resets to 0.5
    # on attack onset — set this BELOW warmup_fx_gate to keep carriers
    # frozen until the ATTACKED code also decodes. Requires
    # warmup_ber_gate. 0 = off. EXACT zero updates while frozen also
    # relies on AdamW.decay_exclude_msg_path=true (the default): with it
    # false, optax.adamw's decoupled weight-decay term still moves
    # msg_*/film_* params every step despite zeroed gradients.
    warmup_msg_freeze_gate: float = 0.0
    # Lockstep-triggered msg-path RE-freeze (VERDICT r3 weak #1; requires
    # warmup_ber_gate). After the freeze latch above opens, joint updates
    # can re-enter the per-bit sign-flip lockstep — live signature: a bit's
    # decision-accuracy EMA pinned WELL below chance (4 bits < 0.4 on the
    # r4 run 4k steps post-unfreeze). When true, msg-path updates re-freeze
    # while any active bit's acc EMA < 0.35 and thaw when all recover
    # > 0.45: against a stationary code the detector fixes an inverted bit
    # by flipping its readout, which joint updates never converge to. The
    # trigger sits well below chance ON PURPOSE: a weak-but-aligned bit
    # (quiet audio channel, acc ~0.4-0.6) needs generator growth, which a
    # freeze would block (measured, r5 run @3k: a 0.45 trigger starved the
    # one weak bit while its three peers sat at accuracy 1.0).
    warmup_msg_refreeze: bool = False
    # nbits curriculum (VERDICT r2 priority 1c). When > 0, the decoding
    # losses are masked to the first N bits (host-fed traced [nbits]
    # weight vector — no recompiles); N starts at warmup_nbits_start and
    # DOUBLES (capped at nbits) whenever the EMA bit-accuracy over the
    # currently-active bits reaches 1 - warmup_nbits_gate. The k-bit
    # problem is easier than 16-at-once from a cold start; already-active
    # bits keep weight 1 so they are not forgotten, and inactive bits
    # contribute zero gradient until activated. 0 = off (all bits from
    # step 0, reference parity).
    warmup_nbits_start: int = 0
    warmup_nbits_gate: float = 0.02
    # Attack-curriculum gate (0 = off -> attacks from step 0, reference
    # parity). When > 0 the effect scheduler selects only `identity` until
    # the train-BER EMA first reaches the gate, then latches attacks ON for
    # the rest of the run (host-side latch in BerGatedRamp; the gate value
    # should sit ABOVE warmup_ber_gate so the stage order is: clean code
    # forms -> attacks on -> perceptual squeeze). Isolation experiments
    # (scripts/exp_decode.py, docs/TRAINING.md) show generator<->detector
    # co-learning forms the clean code in O(1k) steps when the attacked-path
    # gradient noise is kept out of the early phase. Requires
    # warmup_ber_gate.
    warmup_fx_gate: float = 0.0
    # Auxiliary decoding loss on the CLEAN watermarked audio (no
    # localization augmentation, no attacks; target = message everywhere).
    # 0.0 = reference parity (decoding loss only on the attacked path,
    # scripts/loss.py:1021-1099). A nonzero weight gives the
    # generator<->detector pair an undistorted gradient channel while the
    # message code forms — the standard two-term decode objective of recent
    # audio-watermark recipes — and costs one extra detector forward.
    lambda_dec_clean: float = 0.0
    # Bit-level decoding BCE on the masked time-MEAN logit (the deployed
    # decision quantity) — applied to the attacked path and, when
    # lambda_dec_clean > 0, to the clean path too. 0.0 = reference parity.
    # The per-frame BCE's gradient is dominated by confidently-wrong frames;
    # this term pushes the per-bit decision directly (losses.py:
    # decoding_loss_bits).
    lambda_dec_bits: float = 0.0
    # Low-band decode loss (contingency named by VERDICT r4 task 3 /
    # ROADMAP priority 3): decode a LOWPASSED copy of the clean
    # watermarked audio (cutoff lowband_cutoff_hz) and apply the same
    # frame + bit BCEs, forcing carrier energy below the cutoff so
    # lowpass/resample attacks can't strip the code. 0.0 = reference
    # parity (the reference has no such term; its low-band robustness
    # comes from the attack distribution alone). Costs one extra
    # detector forward when enabled.
    lambda_dec_lowband: float = 0.0
    lowband_cutoff_hz: float = 2000.0


@dataclass(frozen=True)
class OptimConfig:
    """conf/base.yml:128-135."""

    lr: float = 1e-4
    beta1: float = 0.8
    beta2: float = 0.99
    exp_gamma: float = 0.999996
    max_grad_norm: float = 10.0
    # LR multiplier for the detector subtree of the watermarking optimizer
    # (1.0 = reference: one AdamW over generator+detector+locator). The
    # reading side adapting faster than the writing side helps escape the
    # no-bit-channel saddle (see docs/TRAINING.md).
    detector_lr_mult: float = 1.0
    # LR multiplier for the generator subtree; the message channel lives in
    # the generator's FiLM pathway, which otherwise crawls at the shared lr
    # while the perceptual ramp is closed. Resume-compatible with runs that
    # used any *_lr_mult (the multi_transform state structure is identical).
    generator_lr_mult: float = 1.0
    # Exempt the message-embedding MLP (msg_in/msg_hidden_*) and FiLM
    # readouts (film_*) from AdamW weight decay. Reference decays the whole
    # model (torch AdamW default 0.01); decay on these weights kills the
    # audio channel of every not-yet-decoded bit (see train/state.py).
    decay_exclude_msg_path: bool = True


@dataclass(frozen=True)
class TrainConfig:
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    locator: LocatorConfig = field(default_factory=LocatorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    batch_size: int = 32
    val_batch_size: int = 16
    num_iters: int = 600000
    valid_freq: int = 1000
    sample_freq: int = 10000
    seed: int = 0
    train_duration: float = 1.0
    val_duration: float = 5.0
    # watermarking composite params (reference model/watermarking.py:216-218)
    window_duration: float = 0.1
    k_windows: int = 5
    # rematerialize the forward in the train step (halves peak HBM; roughly
    # doubles the emitted HLO — turn off on compile-memory-limited hosts
    # when the batch fits without it)
    remat: bool = True
    # Sub-hop shift jitter (training-side improvement, default off =
    # reference parity). Rolls every detector/locator input by a per-sample
    # random 0..hop-1 samples AFTER augmentation+attacks (mask rolled
    # identically; the clean-decode path jitters too). Rationale
    # (measured, round 3): with hop-aligned training inputs the detector
    # converges to a PHASE-COHERENT decode of the carrier code — accuracy
    # 0.727 at any hop-multiple circular shift but 0.555 at a ONE-SAMPLE
    # shift. The sequence augmentation's full-range shift (p=0.4 of
    # batches) provides pressure but lets 60% of batches reward the
    # phase-locked shortcut; jittering EVERY batch removes the shortcut so
    # the detector must learn sub-hop shift-invariant (non-coherent /
    # amplitude-based) decoding — which real-world cropping requires.
    sub_hop_jitter: bool = False


# ---------------------------------------------------------------------------
# YAML ingestion (reference conf/base.yml schema)
# ---------------------------------------------------------------------------

_FIELD_ALIASES = {
    # yaml key -> dataclass field
    "activation_kwargs": None,  # handled specially (alpha)
    "norm_kwargs": None,
}


def _extract_section(raw: Dict[str, Any], name: str) -> Dict[str, Any]:
    """Collect nested ``name: {...}`` plus flat ``name.key:`` entries."""
    out: Dict[str, Any] = {}
    nested = raw.get(name)
    if isinstance(nested, dict):
        out.update(nested)
    prefix = name + "."
    for key, value in raw.items():
        if isinstance(key, str) and key.startswith(prefix):
            out[key[len(prefix):]] = value
    return out


def _build(cls, section: Dict[str, Any]):
    valid = {f.name for f in dataclasses.fields(cls)}
    kwargs: Dict[str, Any] = {}
    for key, value in section.items():
        if key == "activation_kwargs" and isinstance(value, dict):
            if "alpha" in value and "activation_alpha" in valid:
                kwargs["activation_alpha"] = float(value["alpha"])
            continue
        if key == "norm_kwargs":
            continue
        if key not in valid:
            continue
        if isinstance(value, list):
            value = tuple(tuple(v) if isinstance(v, list) else v for v in value)
        kwargs[key] = value
    return cls(**kwargs)


def model_config_dict(cfg: "TrainConfig") -> Dict[str, Any]:
    """JSON-able snapshot of the model-architecture sections (saved in
    checkpoint meta so inference reconstructs the exact architecture —
    e.g. ``Generator.msg_mode`` — without the training command line)."""
    return {
        "Generator": dataclasses.asdict(cfg.generator),
        "Detector": dataclasses.asdict(cfg.detector),
        "Locator": dataclasses.asdict(cfg.locator),
    }


def apply_model_config(cfg: "TrainConfig", snap: Dict[str, Any]) -> "TrainConfig":
    """Overlay a :func:`model_config_dict` snapshot onto ``cfg``."""
    out = cfg
    if snap.get("Generator"):
        out = dataclasses.replace(
            out, generator=_build(GeneratorConfig, snap["Generator"]))
    if snap.get("Detector"):
        out = dataclasses.replace(
            out, detector=_build(DetectorConfig, snap["Detector"]))
    if snap.get("Locator"):
        out = dataclasses.replace(
            out, locator=_build(LocatorConfig, snap["Locator"]))
    return out


def load_config(path: Union[str, Path, None] = None,
                overrides: Optional[Dict[str, Any]] = None) -> TrainConfig:
    """Load a TrainConfig from a reference-format YAML file (or defaults)."""
    raw: Dict[str, Any] = {}
    if path is not None:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    if overrides:
        raw.update(overrides)

    gen = _build(GeneratorConfig, _extract_section(raw, "Generator"))
    det = _build(DetectorConfig, _extract_section(raw, "Detector"))
    loc = _build(LocatorConfig, _extract_section(raw, "Locator"))
    disc = _build(DiscriminatorConfig, _extract_section(raw, "Discriminator"))

    loss_kwargs: Dict[str, Any] = {}
    # nested `lambdas: {...}` plus flat `lambdas.dec/loss:` keys (the flat
    # form is what `--set lambdas.dec/loss_clean=...` produces)
    lambdas = _extract_section(raw, "lambdas")
    lam_map = {
        "waveform/loss": "lambda_waveform",
        "mel/loss": "lambda_mel",
        "stft/loss": "lambda_stft",
        "adv/gen_loss": "lambda_adv_gen",
        "loc/loss": "lambda_loc",
        "dec/loss": "lambda_dec",
        "dec/loss_clean": "lambda_dec_clean",
        "dec/loss_bits": "lambda_dec_bits",
        "dec/loss_lowband": "lambda_dec_lowband",
    }
    for k, v in (lambdas or {}).items():
        if k in lam_map:
            loss_kwargs[lam_map[k]] = float(v)
    msl = _extract_section(raw, "MultiScaleSTFTLoss")
    if "window_lengths" in msl:
        loss_kwargs["stft_window_lengths"] = tuple(msl["window_lengths"])
    mel = _extract_section(raw, "MelSpectrogramLoss")
    if "n_mels" in mel:
        loss_kwargs["mel_n_mels"] = tuple(mel["n_mels"])
    if "window_lengths" in mel:
        loss_kwargs["mel_window_lengths"] = tuple(mel["window_lengths"])
    if "pow" in mel:
        loss_kwargs["mel_pow"] = float(mel["pow"])
    if "clamp_eps" in mel:
        loss_kwargs["mel_clamp_eps"] = float(mel["clamp_eps"])
    if "mag_weight" in mel:
        loss_kwargs["mel_mag_weight"] = float(mel["mag_weight"])
    warm = _extract_section(raw, "warmup")
    if "steps" in warm:
        loss_kwargs["warmup_steps"] = int(warm["steps"])
    if "init_scale" in warm:
        loss_kwargs["warmup_init_scale"] = float(warm["init_scale"])
    if "ber_gate" in warm:
        loss_kwargs["warmup_ber_gate"] = float(warm["ber_gate"])
    if "disc_every" in warm:
        loss_kwargs["warmup_disc_every"] = int(warm["disc_every"])
    if "fx_gate" in warm:
        loss_kwargs["warmup_fx_gate"] = float(warm["fx_gate"])
    if "alt_period" in warm:
        loss_kwargs["warmup_alt_period"] = int(warm["alt_period"])
    if "alt_gen_frac" in warm:
        loss_kwargs["warmup_alt_gen_frac"] = float(warm["alt_gen_frac"])
    if "msg_freeze_gate" in warm:
        loss_kwargs["warmup_msg_freeze_gate"] = float(warm["msg_freeze_gate"])
    if "msg_refreeze" in warm:
        loss_kwargs["warmup_msg_refreeze"] = bool(warm["msg_refreeze"])
    if "nbits_start" in warm:
        loss_kwargs["warmup_nbits_start"] = int(warm["nbits_start"])
    if "nbits_gate" in warm:
        loss_kwargs["warmup_nbits_gate"] = float(warm["nbits_gate"])
    if "lowband_cutoff_hz" in raw:
        loss_kwargs["lowband_cutoff_hz"] = float(raw["lowband_cutoff_hz"])
    loss = LossConfig(**loss_kwargs)

    adamw = _extract_section(raw, "AdamW")
    explr = _extract_section(raw, "ExponentialLR")
    optim_kwargs: Dict[str, Any] = {}
    if "lr" in adamw:
        optim_kwargs["lr"] = float(adamw["lr"])
    if "betas" in adamw:
        optim_kwargs["beta1"] = float(adamw["betas"][0])
        optim_kwargs["beta2"] = float(adamw["betas"][1])
    if "gamma" in explr:
        optim_kwargs["exp_gamma"] = float(explr["gamma"])
    if "detector_lr_mult" in adamw:
        optim_kwargs["detector_lr_mult"] = float(adamw["detector_lr_mult"])
    if "generator_lr_mult" in adamw:
        optim_kwargs["generator_lr_mult"] = float(adamw["generator_lr_mult"])
    optim = OptimConfig(**optim_kwargs)

    top: Dict[str, Any] = {}
    for k in ("batch_size", "val_batch_size", "num_iters", "valid_freq",
              "sample_freq", "seed", "train_duration", "val_duration",
              "remat", "sub_hop_jitter"):
        if k in raw:
            top[k] = raw[k]

    return TrainConfig(
        generator=gen,
        detector=det,
        locator=loc,
        discriminator=disc,
        loss=loss,
        optim=optim,
        **top,
    )
