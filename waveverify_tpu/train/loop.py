"""Outer training loop: host scheduler feedback, logging, checkpoints.

The reference's train() (scripts/train.py:1899-2015) drives: data batch ->
train_loop -> periodic validate/save_samples/checkpoint. This loop keeps the
same cadence and host responsibilities but the entire step is ONE jitted XLA
program; the only host work per step is (a) the next batch, (b) effect
selection (integer indices), (c) scheduler EMA updates from the per-sample
metrics the step returns.

Async by design: metrics are fetched with a one-step delay so the scheduler
update for step N happens while step N+1 runs on device.
"""

from __future__ import annotations

import json
import logging
import time
from collections.abc import Mapping
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveverify_tpu.config import TrainConfig, model_config_dict
from waveverify_tpu.effects.effects import EffectBank
from waveverify_tpu.effects.effects_config import load_effects_config
from waveverify_tpu.effects.scheduler import EffectScheduler
from waveverify_tpu.parallel import (
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_train_step,
)
from waveverify_tpu.parallel.mesh import (
    local_batch_rows,
    shard_multi_step,
    shard_stacked_batch,
)
from waveverify_tpu.train import checkpoint as ckpt
from waveverify_tpu.train.data import (
    AudioFolderDataset,
    SyntheticAudioDataset,
    generate_random_message,
    prefetch_batches,
)
from waveverify_tpu.train.state import TrainState, create_train_state
from waveverify_tpu.train.step import (
    make_multi_train_step,
    make_train_step,
    make_val_step,
)
from waveverify_tpu.train.watermarking import WatermarkModels

logger = logging.getLogger(__name__)


def _coordination_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Best-effort cross-process barrier via the jax.distributed
    coordination service (NOT a device collective — usable while XLA's Gloo
    context does not exist yet, and with a generous timeout where Gloo's
    key-value exchange only allows ~30 s).

    The timeout must exceed the worst-case one-sided work it guards —
    process 0's cold-cache validation COMPILE is the long pole (measured
    >600 s with two processes sharing one CPU core): a waiter that times
    out proceeds to exit and trips jax.distributed's fatal ~60 s shutdown
    barrier, killing the run."""
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
    except Exception:  # pragma: no cover - barrier is best-effort
        logger.warning("coordination barrier %r unavailable", name,
                       exc_info=True)


class Tracker:
    """Minimal stand-in for audiotools' Tracker (reference scripts/train.py:
    1975-1988): step timing, metric EMA, history to JSONL, best tracking.

    ``tb_dir`` additionally mirrors every scalar to TensorBoard when the
    package is importable (reference writes TB rank-0 only,
    scripts/train.py:1939-1942; caller gates on process_index)."""

    def __init__(self, log_file: Optional[str] = None, ema: float = 0.99,
                 tb_dir: Optional[str] = None,
                 wandb_project: Optional[str] = None,
                 wandb_config: Optional[Dict] = None):
        self.ema = ema
        self.smoothed: Dict[str, float] = {}
        self.best_val_loss = float("inf")
        self.log_file = Path(log_file) if log_file else None
        if self.log_file is not None:
            self.log_file.parent.mkdir(parents=True, exist_ok=True)
        self._t_last = time.perf_counter()
        self._last_step: Optional[int] = None
        self._tb = None
        self._wandb = None
        if tb_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tb_dir)
            except Exception as exc:  # optional dep, never fatal
                logger.warning("TensorBoard unavailable (%s); JSONL only", exc)
        if wandb_project is not None:
            # reference logs metrics + audio to wandb
            # (scripts/train.py:281-293, setup_run :2018-2040); optional-dep
            # guarded the same way as TB — absence never fails a run
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project,
                                         config=wandb_config or {})
            except Exception as exc:
                logger.warning("wandb unavailable (%s); JSONL/TB only", exc)

    def update(self, step: int, metrics: Dict[str, float],
               include_time: bool = True) -> Dict[str, float]:
        now = time.perf_counter()
        if include_time:
            # normalize by how many steps elapsed since the last update so
            # step_time is per-step even when logging every N steps
            d_steps = max(1, step - self._last_step) if self._last_step is not None else 1
            metrics = dict(metrics, step_time=(now - self._t_last) / d_steps)
            self._last_step = step
        # always reset the clock so a long off-path update (validation,
        # checkpointing) is not billed to the next train step's step_time
        self._t_last = now
        for k, v in metrics.items():
            if not np.isscalar(v) and getattr(v, "ndim", 1) != 0:
                continue
            v = float(v)
            self.smoothed[k] = (
                v if k not in self.smoothed
                else self.ema * self.smoothed[k] + (1 - self.ema) * v
            )
        scalars = {k: float(v) for k, v in metrics.items()
                   if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
        if self.log_file:
            with self.log_file.open("a") as f:
                f.write(json.dumps({"step": step, **scalars}) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        return metrics

    def log_audio(self, step: int, name: str, audio: np.ndarray,
                  sample_rate: int) -> None:
        """Mirror an audio sample to wandb/TB when those sinks are live
        (reference logs samples to wandb, scripts/train.py:1829-1837)."""
        if self._wandb is not None:
            try:
                import wandb

                self._wandb.log(
                    {name: wandb.Audio(audio, sample_rate=sample_rate)},
                    step=step,
                )
            except Exception:
                logger.exception("wandb audio log failed; continuing")
        if self._tb is not None:
            try:
                self._tb.add_audio(name, audio.reshape(1, -1), step,
                                   sample_rate=sample_rate)
            except Exception:
                logger.exception("TB audio log failed; continuing")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()

    def is_best(self, val_loss: float) -> bool:
        if val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            return True
        return False


class BerGatedRamp:
    """Host-side controller for the BER-gated perceptual ramp
    (``LossConfig.warmup_ber_gate``; see docs/TRAINING.md).

    The fixed step-indexed ramp squeezes the watermark on a schedule that
    ignores whether the message channel has actually formed — measured on
    this task, the squeeze routinely outruns decoding and undoes it (val
    BER worsened from 0.30 to 0.37 exactly as SI-SNR climbed 5.6->10 dB).
    This controller advances ramp *progress* (0..1, never backward) by
    1/warmup_steps per train step ONLY while the attacked-path train-BER
    EMA is at or below the gate: the watermark stays loud until decoding
    works, then is squeezed as fast as decoding tolerates, pausing
    automatically whenever the squeeze starts breaking it.

    The scale it produces is fed to the jitted train step as a replicated
    scalar argument each dispatch (host->device, same pattern as the
    effect scheduler's indices) — no recompiles.
    """

    def __init__(self, steps: int, init_scale: float, gate: float,
                 beta: float = 0.98, fx_gate: float = 0.0,
                 msg_freeze_gate: float = 0.0, msg_refreeze: bool = False,
                 nbits: int = 16):
        self.steps = max(int(steps), 1)
        self.init_scale = float(init_scale)
        self.gate = float(gate)
        self.beta = float(beta)
        self.progress = 0.0
        self.ema = 0.5  # chance-level prior
        # attack-curriculum latch (LossConfig.warmup_fx_gate): effects stay
        # identity-only until the train-BER EMA first reaches fx_gate, then
        # attacks latch ON for the rest of the run. fx_gate should sit
        # ABOVE `gate`: clean code forms -> attacks on (EMA jumps back up)
        # -> attacked BER re-descends below `gate` -> perceptual squeeze.
        # 0 = off (attacks from step 0).
        self.fx_gate = float(fx_gate)
        self.fx_latched = fx_gate <= 0.0
        # stationary-carrier freeze latch (LossConfig.warmup_msg_freeze_gate,
        # VERDICT r2 priority 1b): generator msg-path updates stay frozen
        # until the BER EMA first reaches the gate, then unfreeze for good.
        self.msg_freeze_gate = float(msg_freeze_gate)
        self.msg_latched = msg_freeze_gate <= 0.0
        # Lockstep-triggered RE-freeze (LossConfig.warmup_msg_refreeze,
        # VERDICT r3 weak #1): after the freeze latch opens, generator and
        # detector can re-enter the per-bit sign-flip lockstep — the live
        # signature is a bit whose decision-accuracy EMA pins WELL below
        # chance (observed: 4 bits < 0.4 on the r4 run 4k steps
        # post-unfreeze). When enabled, the msg path re-freezes while any
        # ACTIVE bit's acc EMA sits below 0.35 and thaws once all active
        # bits recover above 0.45 (hysteresis): an anti-aligned bit against
        # a stationary code is trivially fixable by the detector (flip its
        # readout), whereas under joint updates the polarity orbits forever.
        # The trigger must sit WELL below chance: a WEAK-but-aligned bit
        # (quiet audio channel) hovers at 0.45-0.62 accuracy and needs the
        # generator to GROW its channel — measured on the r5 run, a 0.45
        # trigger kept re-freezing exactly the updates that would have
        # grown it (bit-0 delta 0.18x audio vs 3.8-6.7x for its decoded
        # peers, scripts/probe_deltas.py @step 3000).
        self.msg_refreeze = bool(msg_refreeze)
        self.msg_refreeze_lo = 0.35
        self.msg_refreeze_hi = 0.45
        self.msg_refrozen = False
        self.bit_acc_ema = np.full(int(nbits), 0.5, np.float64)

    def scale(self) -> float:
        # Stage A (fx latch open): perceptual weight EXACTLY zero. At
        # chance-level BER the decode gradient on the residual's loudness is
        # pure noise while even an init_scale-scaled perceptual gradient is
        # systematic — measured on the round-2 run, the residual L1 shrank
        # 0.23 -> 0.028 over 6k steps at scale 0.01 and the code never
        # formed. With fx_gate disabled (reference-style runs) the latch is
        # pre-set and this floor never applies.
        if not self.fx_latched:
            return 0.0
        return float(self.init_scale ** (1.0 - self.progress))

    def attacks_on(self) -> bool:
        return self.fx_latched

    def msg_on(self) -> bool:
        """True while the carrier projections may update: the one-way
        unfreeze latch has opened AND no lockstep re-freeze is active."""
        return self.msg_latched and not self.msg_refrozen

    def update(self, ber: float, k: int = 1,
               per_bit_acc: Optional[np.ndarray] = None,
               n_active: Optional[int] = None) -> None:
        """Feed one dispatch's mean attacked-path BER covering ``k`` steps.

        ``ber`` should be the ACTIVE-bit BER when the nbits curriculum is
        on (the full-16-bit BER floors at ~(nbits-n_active)/(2*nbits) and
        no gate could ever latch — ADVICE r3). ``per_bit_acc`` [nbits]
        drives the lockstep re-freeze when ``msg_refreeze`` is enabled.
        """
        self.ema = self.beta * self.ema + (1.0 - self.beta) * float(ber)
        if not self.fx_latched and self.ema <= self.fx_gate:
            self.fx_latched = True
            logger.info("attack curriculum: BER EMA %.4f <= fx_gate %.3f — "
                        "effects latched ON", self.ema, self.fx_gate)
            # the EMA measured the unattacked code until now; reset to the
            # chance prior so the perceptual squeeze can't ride the stale
            # clean-path value through its own (lower) gate
            self.ema = 0.5
        if not self.msg_latched and self.ema <= self.msg_freeze_gate:
            self.msg_latched = True
            logger.info("carrier freeze: BER EMA %.4f <= msg_freeze_gate "
                        "%.3f — msg-path updates UNFROZEN", self.ema,
                        self.msg_freeze_gate)
        if per_bit_acc is not None and self.msg_refreeze:
            acc = np.asarray(per_bit_acc, np.float64)
            self.bit_acc_ema[: len(acc)] = (
                self.beta * self.bit_acc_ema[: len(acc)]
                + (1.0 - self.beta) * acc)
            n = (len(self.bit_acc_ema) if n_active is None
                 else max(1, int(n_active)))
            lo = float(self.bit_acc_ema[:n].min())
            if (self.msg_latched and not self.msg_refrozen
                    and lo < self.msg_refreeze_lo):
                self.msg_refrozen = True
                logger.info("lockstep signature: active-bit acc EMA min "
                            "%.3f < %.2f — msg path RE-FROZEN", lo,
                            self.msg_refreeze_lo)
            elif self.msg_refrozen and lo > self.msg_refreeze_hi:
                self.msg_refrozen = False
                logger.info("lockstep cleared: active-bit acc EMA min %.3f "
                            "> %.2f — msg path thawed", lo,
                            self.msg_refreeze_hi)
        # the perceptual squeeze must never advance on clean-only BER: while
        # the fx latch is open the EMA measures an unattacked code
        if self.fx_latched and self.ema <= self.gate:
            self.progress = min(1.0, self.progress + k / self.steps)

    def state_dict(self) -> Dict[str, Any]:
        return {"progress": self.progress, "ema": self.ema,
                "fx_latched": float(self.fx_latched),
                "msg_latched": float(self.msg_latched),
                "msg_refrozen": float(self.msg_refrozen),
                "bit_acc_ema": self.bit_acc_ema.tolist()}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.progress = float(d.get("progress", 0.0))
        self.ema = float(d.get("ema", 0.5))
        self.fx_latched = bool(d.get("fx_latched",
                                     1.0 if self.fx_gate <= 0 else 0.0))
        self.msg_latched = bool(d.get(
            "msg_latched", 1.0 if self.msg_freeze_gate <= 0 else 0.0))
        self.msg_refrozen = bool(d.get("msg_refrozen", 0.0))
        ema = d.get("bit_acc_ema")
        if ema is not None and len(ema) == len(self.bit_acc_ema):
            self.bit_acc_ema = np.asarray(ema, np.float64)


class NbitsCurriculum:
    """Host-side nbits-curriculum controller (LossConfig.warmup_nbits_start,
    VERDICT r2 priority 1c).

    Starts with the first ``start`` bits active; whenever the EMA decision
    accuracy over the ACTIVE bits reaches ``1 - gate``, doubles the active
    count (capped at nbits) and resets the newly-activated bits' EMA to
    chance. Emits a [nbits] 0/1 weight vector fed to the jitted step as a
    traced argument — growing the active set changes no program.
    """

    def __init__(self, nbits: int, start: int, gate: float,
                 beta: float = 0.98):
        self.nbits = int(nbits)
        self.n_active = max(1, min(int(start), self.nbits))
        self.gate = float(gate)
        self.beta = float(beta)
        self.acc_ema = np.full(self.nbits, 0.5, np.float64)

    def mask(self) -> np.ndarray:
        return (np.arange(self.nbits) < self.n_active).astype(np.float32)

    def update(self, per_bit_acc: np.ndarray) -> None:
        self.acc_ema = (self.beta * self.acc_ema
                        + (1.0 - self.beta) * np.asarray(per_bit_acc,
                                                         np.float64))
        if self.n_active < self.nbits:
            active_ber = 1.0 - float(self.acc_ema[: self.n_active].mean())
            if active_ber <= self.gate:
                old = self.n_active
                self.n_active = min(2 * self.n_active, self.nbits)
                self.acc_ema[old : self.n_active] = 0.5
                logger.info(
                    "nbits curriculum: active-bit BER %.4f <= gate %.3f — "
                    "growing %d -> %d active bits", active_ber, self.gate,
                    old, self.n_active)

    def state_dict(self) -> Dict[str, Any]:
        return {"n_active": self.n_active,
                "acc_ema": self.acc_ema.tolist()}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.n_active = int(d.get("n_active", self.n_active))
        ema = d.get("acc_ema")
        if ema is not None and len(ema) == self.nbits:
            self.acc_ema = np.asarray(ema, np.float64)


@dataclass
class TrainerConfig:
    """Host-side loop knobs, separate from the model/optim TrainConfig."""

    train_folders: Tuple[str, ...] = ()
    val_folders: Tuple[str, ...] = ()
    ckpt_dir: str = "checkpoints"
    # warm-start the watermarking params (generator/detector/locator) from a
    # save_weights_npz file when no orbax checkpoint is being resumed —
    # lets a run continue from committed compact weights after the round
    # boundary wipes the (gitignored) orbax dirs. Optimizer state, the
    # discriminator, and the step counter start fresh.
    init_weights: Optional[str] = None
    # Checkpoint meta.json (or a hand-written subset) applied alongside
    # --init-weights: restores step counter, ramp/nbits/effect-scheduler
    # state so a warm start after the round boundary (or a recycled
    # container) continues the controllers where the lost orbax checkpoint
    # left them instead of replaying the whole gate curriculum. Ignored
    # when an orbax resume is available (that path restores the same state
    # from the checkpoint's own meta).
    init_meta: Optional[str] = None
    # After resume/warm-start, replace the generator's message-embedding MLP
    # (msg_in/msg_hidden_*) with fresh init. Used when continuing a
    # checkpoint whose message channels collapsed under weight decay (see
    # modules/seanet.py:_msg_embed) or when switching Generator.msg_mode.
    reinit_msg_path: bool = False
    log_file: Optional[str] = "train_log.jsonl"
    save_iters: Tuple[int, ...] = (100000, 200000, 400000, 600000)
    num_devices: Optional[int] = None
    log_every: int = 50
    match_reference_effect_cap: bool = False
    # jax.profiler trace of steps [profile_start, profile_stop) written to
    # <ckpt_dir>/profile (replaces the reference's audiotools Tracker timing,
    # SURVEY.md §5)
    profile_start: Optional[int] = None
    profile_stop: Optional[int] = None
    # wav dumps of (clean, watermarked) pairs every cfg.sample_freq steps
    # (reference save_samples, scripts/train.py:1728-1846)
    dump_samples: bool = True
    # EffectBank dispatch: "stack" (all branches, one-hot gather — best for
    # small banks) or "scan" (per-sample lax.switch — E-independent work
    # for large grids; see docs/EFFECT_DISPATCH.md crossover)
    effect_dispatch: str = "stack"
    # effects YAML (conf/effects_config.yml schema); None tries the repo
    # default path and falls back to built-in defaults, exactly like the
    # reference's load_effects_config (model/watermarking.py:55-181)
    effects_config: Optional[str] = None
    # TensorBoard event dir (scalars mirrored from the JSONL stream;
    # reference scripts/train.py:1939-1942 is rank-0 TB the same way)
    tensorboard_dir: Optional[str] = None
    # wandb project (metrics + audio samples mirrored when the optional lib
    # is importable; reference scripts/train.py:281-293, :1829-1837)
    wandb_project: Optional[str] = None
    # Pallas kernel mode for this process ("auto"|"on"|"off"). The fused
    # resblock kernels inflate the train-step HLO (custom_vjp under remat +
    # second-order GP); memory-tight remote compile services may need "off"
    # for training while inference keeps "auto".
    pallas_mode: Optional[str] = None
    # K steps per XLA dispatch via lax.scan (same program size as one step;
    # amortizes remote-device dispatch/fetch latency K-fold). Scheduler
    # feedback/logging granularity becomes K steps, and the run length
    # rounds up to a K multiple.
    steps_per_dispatch: int = 1
    # MXU precision for convs during training ("highest" = f32 accumulation
    # for reference parity, the default; "default" = one-pass bf16 — ~2x
    # conv throughput, run a BER-impact study before adopting)
    conv_precision: Optional[str] = None
    # Split-program mode (VERDICT r3 task 5): the discriminator update
    # (with its second-order gradient-penalty graph) compiles as its own
    # XLA program and the train step excludes it — each program is roughly
    # half the monolithic HLO, fitting remat/Pallas under compile services
    # that OOM on the whole graph. Semantics are identical (same RNG
    # streams, same disc-before-generator ordering); costs one extra
    # no-grad generator forward on disc-training steps. K>1 dispatch is
    # monolithic-only.
    split_disc_step: bool = False


def train(cfg: TrainConfig, trainer: TrainerConfig = TrainerConfig(),
          max_steps: Optional[int] = None,
          resume: bool = False) -> TrainState:
    """Full training run. Returns the final TrainState."""
    mesh = make_mesh(trainer.num_devices)
    n_dev = mesh.devices.size
    if cfg.batch_size % n_dev:
        raise ValueError(f"batch_size {cfg.batch_size} must divide over "
                         f"{n_dev} devices")
    if trainer.pallas_mode is not None:
        from waveverify_tpu.ops.pallas_kernels import set_pallas_mode

        set_pallas_mode(trainer.pallas_mode)
    if trainer.conv_precision is not None:
        from waveverify_tpu.modules.conv import set_conv_precision

        set_conv_precision(trainer.conv_precision)
    models = WatermarkModels.from_config(cfg)
    fx_cfg = load_effects_config(trainer.effects_config)
    bank = EffectBank(fx_cfg.train_effects, cfg.generator.sample_rate,
                      dispatch=trainer.effect_dispatch)
    scheduler = EffectScheduler(
        effect_params=fx_cfg.effect_param_grid,
        beta=fx_cfg.beta,
        ber_threshold=fx_cfg.ber_threshold,
        miou_threshold=fx_cfg.miou_threshold,
        rng=np.random.RandomState(cfg.seed + 1),
    )
    # Multi-host: each process feeds its local slice of the global batch
    # (assembled into one jax.Array by shard_batch); host-side artifacts
    # (JSONL/TB/wandb, checkpoints, sample dumps, validation) are process-0
    # only. The reference's DDP equivalent: per-rank DistributedSampler +
    # LOCAL_RANK-gated logging (reference scripts/train.py:875-876, :2140).
    n_proc = jax.process_count()
    if cfg.batch_size % n_proc:
        raise ValueError(f"batch_size {cfg.batch_size} must divide over "
                         f"{n_proc} processes")
    local_bs = cfg.batch_size // n_proc
    is_proc0 = jax.process_index() == 0
    tracker = Tracker(
        trainer.log_file if is_proc0 else None,
        tb_dir=trainer.tensorboard_dir if is_proc0 else None,
        wandb_project=trainer.wandb_project if is_proc0 else None,
        wandb_config={"batch_size": cfg.batch_size,
                      "num_iters": cfg.num_iters,
                      "lr": cfg.optim.lr},
    )

    ramp: Optional[BerGatedRamp] = None
    if cfg.loss.warmup_ber_gate > 0:
        ramp = BerGatedRamp(cfg.loss.warmup_steps,
                            cfg.loss.warmup_init_scale,
                            cfg.loss.warmup_ber_gate,
                            fx_gate=cfg.loss.warmup_fx_gate,
                            msg_freeze_gate=cfg.loss.warmup_msg_freeze_gate,
                            msg_refreeze=cfg.loss.warmup_msg_refreeze,
                            nbits=cfg.generator.msg_dimension)
    curr: Optional[NbitsCurriculum] = None
    if ramp is not None and cfg.loss.warmup_nbits_start > 0:
        curr = NbitsCurriculum(cfg.generator.msg_dimension,
                               cfg.loss.warmup_nbits_start,
                               cfg.loss.warmup_nbits_gate)

    key = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(cfg, key, models)
    fresh_wm_params = state.wm_params if trainer.reinit_msg_path else None
    start_step = 0
    resumed_from_ckpt = False
    if resume and "latest" in ckpt.checkpoint_tags(trainer.ckpt_dir):
        resumed_from_ckpt = True
        try:
            state, meta = ckpt.load_checkpoint(trainer.ckpt_dir, "latest",
                                               state)
        except ValueError:
            # Optimizer-chain structure changed between runs (e.g. the
            # weight-decay mask or an lr-mult multi_transform was added):
            # restore params + step structure-free, start optimizer fresh.
            logger.warning(
                "full-state resume failed (optimizer structure changed) — "
                "params-only resume, optimizer state starts fresh")
            raw, meta = ckpt.load_state_free(trainer.ckpt_dir, "latest")

            def _cast(template, loaded):
                return jax.tree_util.tree_map(
                    lambda init, new: jnp.asarray(new, init.dtype).reshape(
                        init.shape), template, loaded)

            state = state.replace(
                wm_params=_cast(state.wm_params, raw["wm_params"]),
                disc_params=_cast(state.disc_params, raw["disc_params"]),
                step=jnp.asarray(raw["step"], state.step.dtype),
            )
        start_step = int(meta.get("step", 0))
        if meta.get("scheduler_state"):
            scheduler.load_state_dict(meta["scheduler_state"])
        if ramp is not None and meta.get("ramp_state"):
            ramp.load_state_dict(meta["ramp_state"])
        if curr is not None and meta.get("nbits_state"):
            curr.load_state_dict(meta["nbits_state"])
        tracker.best_val_loss = float(meta.get("best_val_loss", float("inf")))
        logger.info("resumed from step %d", start_step)
    elif trainer.init_weights:
        from waveverify_tpu.convert import load_weights_npz

        loaded = load_weights_npz(trainer.init_weights)
        # cast/validate against the freshly-initialized tree so shapes and
        # dtypes are guaranteed to match the compiled program
        state = state.replace(wm_params=jax.tree_util.tree_map(
            lambda init, new: jnp.asarray(new, init.dtype).reshape(init.shape),
            state.wm_params, loaded,
        ))
        logger.info("warm-started wm_params from %s", trainer.init_weights)
        if trainer.init_meta:
            meta = json.loads(Path(trainer.init_meta).read_text())
            start_step = int(meta.get("step", 0))
            state = state.replace(
                step=jnp.asarray(start_step, state.step.dtype))
            if meta.get("scheduler_state"):
                scheduler.load_state_dict(meta["scheduler_state"])
            if ramp is not None and meta.get("ramp_state"):
                ramp.load_state_dict(meta["ramp_state"])
            if curr is not None and meta.get("nbits_state"):
                curr.load_state_dict(meta["nbits_state"])
            logger.info(
                "restored controller state from %s (step %d, ramp %s, "
                "nbits %s)", trainer.init_meta, start_step,
                ramp.state_dict() if ramp is not None else None,
                curr.n_active if curr is not None else None)
    # Supervisors relaunch the trainer with identical flags after a crash;
    # re-grafting on every relaunch would wipe msg-path learning. But that
    # learning only survives a relaunch through a checkpoint — so skip the
    # graft exactly when this process resumed from one. (A crash before the
    # first checkpoint re-loads the npz warm start, whose msg path is the
    # stale one the graft exists to replace — a once-only sentinel file
    # would wrongly skip it there.)
    if fresh_wm_params is not None and resumed_from_ckpt:
        logger.info("resumed from a checkpoint — skipping msg-path reinit")
        fresh_wm_params = None
    if fresh_wm_params is not None:
        def _graft_msg(fresh, loaded, in_msg=False):
            if isinstance(fresh, Mapping):
                return {
                    k: _graft_msg(fresh[k], loaded[k],
                                  in_msg or k.startswith(("msg_", "film_")))
                    for k in fresh
                }
            return fresh if in_msg else loaded

        state = state.replace(
            wm_params=_graft_msg(fresh_wm_params, state.wm_params))
        logger.info("re-initialized message path (msg_*, film_*)")
    # Commit the state to the mesh BEFORE the first step: host-built arrays
    # have no mesh in their aval sharding, so the state returned by step 1
    # (mesh-typed) would otherwise be a cache miss and the whole train step
    # would compile twice (fatal on memory-tight compile services).
    if jax.process_count() > 1:
        # Align processes before the FIRST cross-process collective: the
        # replicated device_put below initializes the Gloo context, whose
        # key-value exchange has a hard ~30 s window. Model init above is
        # minutes of single-process work, so on contended hosts processes
        # arrive staggered beyond that window (observed in the 2-process CPU
        # test). The coordination-service barrier has no such limit.
        _coordination_barrier("waveverify_pre_replicate")
    state = jax.device_put(state, replicated_sharding(mesh))

    # alternating optimization (config warmup_alt_period): requires the
    # BER-gated ramp (its progress==0 phase defines "channel formation").
    # The train_disc flag is force-enabled alongside it so the positional
    # trailing-scalar order (percep, disc, gen) stays fixed.
    alt = ramp is not None and cfg.loss.warmup_alt_period > 0
    # Trailing traced args are positional (percep, disc, gen, msg,
    # bit_mask): enabling a later slot force-enables the earlier scalar
    # slots (held at their neutral values) so the order stays fixed — same
    # trick as train_disc alongside alt.
    nbits_on = curr is not None
    msg_freeze = ((ramp is not None
                   and (cfg.loss.warmup_msg_freeze_gate > 0
                        or cfg.loss.warmup_msg_refreeze)) or nbits_on)
    gen_scalar = alt or msg_freeze
    disc_gate = ((ramp is not None and cfg.loss.warmup_disc_every > 1)
                 or gen_scalar)
    disc_fn = None
    if trainer.split_disc_step:
        if trainer.steps_per_dispatch > 1:
            raise ValueError("split_disc_step requires steps_per_dispatch=1")
        from waveverify_tpu.parallel import shard_disc_step
        from waveverify_tpu.train.step import make_disc_step

        disc_fn = shard_disc_step(make_disc_step(models, cfg), mesh)
    if trainer.steps_per_dispatch > 1:
        step_fn = shard_multi_step(
            make_multi_train_step(models, cfg, bank,
                                  trainer.steps_per_dispatch), mesh,
            with_percep_scale=ramp is not None,
            with_train_disc=disc_gate,
            with_gen_scale=gen_scalar,
            with_msg_scale=msg_freeze,
            with_bit_mask=nbits_on,
        )
    else:
        step_fn = shard_train_step(
            make_train_step(models, cfg, bank,
                            update_disc=disc_fn is None), mesh,
            with_percep_scale=ramp is not None,
            with_train_disc=disc_gate,
            with_gen_scale=gen_scalar,
            with_msg_scale=msg_freeze,
            with_bit_mask=nbits_on)
    val_fn = jax.jit(
        make_val_step(models, cfg, eval_effects=list(fx_cfg.eval_effects))
    )

    # On resume, mix the resume step into the data seeds so the stream
    # continues with fresh data instead of replaying from the beginning
    # (the reference fast-forwards its dataloader the same way,
    # scripts/train.py:1957 start_idx = step * batch_size).
    data_seed = cfg.seed + start_step + 7919 * jax.process_index()
    if trainer.train_folders:
        train_ds = AudioFolderDataset(trainer.train_folders, cfg.train_duration,
                                      cfg.generator.sample_rate, data_seed)
    else:
        logger.warning("no train folders given — using synthetic audio")
        train_ds = SyntheticAudioDataset(cfg.train_duration,
                                         cfg.generator.sample_rate, data_seed)
    if trainer.val_folders:
        val_ds = AudioFolderDataset(trainer.val_folders, cfg.val_duration,
                                    cfg.generator.sample_rate, cfg.seed + 7)
    else:
        val_ds = SyntheticAudioDataset(cfg.val_duration,
                                       cfg.generator.sample_rate, cfg.seed + 7)

    batches = prefetch_batches(train_ds, local_bs,
                               cfg.generator.msg_dimension, data_seed)
    total = max_steps if max_steps is not None else cfg.num_iters

    # (local per-sample metrics, local selections, replicated train/ber,
    #  replicated per-bit accuracy)
    pending: Optional[
        Tuple[Dict[str, Any], List[Tuple[str, Dict]], Any, Any]] = None
    val_rng = np.random.RandomState(cfg.seed + 13)

    sample_fn = None
    if trainer.dump_samples:
        from waveverify_tpu.train.watermarking import forward_audio_sample

        sample_fn = jax.jit(
            lambda p, a, m: forward_audio_sample(models, p, a, m)
        )

    K = max(1, int(trainer.steps_per_dispatch))
    profiling = False
    step = start_step
    while step < total:
        if (trainer.profile_start is not None and not profiling
                and step >= trainer.profile_start
                and (trainer.profile_stop is None
                     or step < trainer.profile_stop)):
            jax.profiler.start_trace(str(Path(trainer.ckpt_dir) / "profile"))
            profiling = True
        if (trainer.profile_stop is not None and profiling
                and step >= trainer.profile_stop):
            jax.profiler.stop_trace()
            profiling = False

        ramp_args = ((np.float32(ramp.scale()),) if ramp is not None else ())
        disc_now = True  # whether the discriminator trains this step
        if disc_gate:
            # discriminator cadence: every step once the ramp is squeezing
            # (adversarial feedback now matters), every warmup.disc_every-th
            # step while it is closed (weight stuck at init_scale — the
            # ensemble + GP is the dominant share of device time there).
            # K>1 dispatches get a [K] per-step vector scanned inside the
            # program (make_multi_train_step) — a constant would train the
            # disc on all K steps of every gated dispatch.
            if K == 1:
                disc_now = bool(ramp.progress > 0.0
                                or (step % cfg.loss.warmup_disc_every == 0))
                ramp_args = ramp_args + (np.bool_(disc_now),)
            else:
                ramp_args = ramp_args + (np.asarray(
                    [ramp.progress > 0.0
                     or ((step + j) % cfg.loss.warmup_disc_every == 0)
                     for j in range(K)], dtype=np.bool_),)
        gen_on = True
        if gen_scalar and not alt:
            # freeze-only runs: gen scalar present for positional order,
            # held open
            ramp_args = ramp_args + (np.float32(1.0),)
        if alt:
            # alternating optimization while the ramp is closed: generator
            # frozen (detector/locator keep training) for the first
            # 1 - alt_gen_frac of each alt_period, then unfrozen for the
            # tail — breaks the generator<->detector sign-flip lockstep on
            # individual bits. Det-phase-FIRST so the run opens with the
            # detector learning the stationary init-time code (carrier
            # through the frozen random decoder) before the generator ever
            # moves; a chasing detector never catches a moving carrier.
            # Joint updates resume permanently once the ramp starts moving.
            period = cfg.loss.warmup_alt_period
            gen_steps = max(1, int(period * cfg.loss.warmup_alt_gen_frac))
            gen_on = (ramp.progress > 0.0
                      or step % period >= period - gen_steps)
            ramp_args = ramp_args + (np.float32(1.0 if gen_on else 0.0),)
        if msg_freeze:
            # stationary-carrier freeze: msg-path updates zeroed until the
            # host latch (BER EMA <= msg_freeze_gate) opens, then permanent
            ramp_args = ramp_args + (
                np.float32(1.0 if ramp.msg_on() else 0.0),)
        if nbits_on:
            ramp_args = ramp_args + (curr.mask(),)
        # attack curriculum (LossConfig.warmup_fx_gate): identity-only
        # branch indices until the host latch opens. Host-side only — the
        # compiled program is unchanged; every process computes the same
        # latch from the replicated BER EMA.
        fx_on = ramp is None or ramp.attacks_on()

        def _select(n):
            if fx_on:
                return scheduler.select_bank_indices(
                    n, bank.specs,
                    match_reference_cap=trainer.match_reference_effect_cap,
                )
            return (np.full(n, _identity_branch(bank), np.int32),
                    [bank.specs[_identity_branch(bank)]] * n)

        if K == 1:
            audio, msg = next(batches)
            idx, selections = _select(local_bs)
            audio_d, msg_d, idx_d = shard_batch(mesh, audio, msg, idx)
            if step == start_step and jax.process_count() > 1:
                # First dispatch creates the full-mesh Gloo context inside
                # XLA, whose key-value exchange times out at ~30 s — but the
                # preceding per-process train-step compile takes minutes and
                # staggers processes on contended hosts. Compile ahead of
                # time, then re-align so every process enters execution
                # within the Gloo window.
                step_fn.lower(state, audio_d, msg_d, idx_d, key,
                              *ramp_args).compile()
                _coordination_barrier("waveverify_pre_first_dispatch")
            disc_metrics = None
            if disc_fn is not None and disc_now:
                # split-program mode: refresh the discriminator FIRST (the
                # generator program's adversarial terms must see the updated
                # ensemble — reference ordering, scripts/train.py:1248-1360)
                state, disc_metrics = disc_fn(state, audio_d, msg_d, key)
            state, metrics = step_fn(state, audio_d, msg_d, idx_d, key,
                                     *ramp_args)
            if disc_metrics is not None:
                # the gen program reports zeros for the disc scalars
                metrics = {**metrics, **disc_metrics}
            last_batch = (audio, msg)
        else:
            audios, msgs, idxs = [], [], []
            selections = []
            for _ in range(K):
                a, m = next(batches)
                i, sel = _select(local_bs)
                audios.append(a)
                msgs.append(m)
                idxs.append(i)
                selections.append(sel)
            audio_d, msg_d, idx_d = shard_stacked_batch(
                mesh, np.stack(audios), np.stack(msgs), np.stack(idxs)
            )
            state, metrics = step_fn(state, audio_d, msg_d, idx_d, key,
                                     *ramp_args)
            last_batch = (audios[-1], msgs[-1])

        # scheduler/ramp feedback, one dispatch delayed (device busy with
        # N+1). Per-sample metrics are batch-SHARDED: fetch only this
        # process's own rows (global fetch is illegal multi-host, and the
        # scheduler's `selections` are local rows anyway). The ramp instead
        # feeds on the REPLICATED scalar `train/ber` (global-batch mean
        # computed inside the jitted step): every process sees the same
        # value, so the host-side ramp state — and the percep_scale each
        # process feeds back as a "replicated" scalar — stays bit-identical
        # across processes. Local rows would drift it.
        if pending is not None:
            _feed_scheduler(scheduler, pending[0], pending[1])
            acc = np.asarray(pending[3])
            acc = acc.mean(axis=0) if acc.ndim == 2 else acc
            if curr is not None:
                curr.update(acc)
                # feed the gates the ACTIVE-bit BER: with the curriculum on,
                # the full-16-bit BER floors at ~(nbits-n_active)/(2*nbits)
                # (inactive bits sit at chance) and gates like 0.12-0.3
                # could never latch (ADVICE r3)
                gate_ber = 1.0 - float(acc[: curr.n_active].mean())
            else:
                gate_ber = float(np.mean(np.asarray(pending[2])))
            if ramp is not None:
                ramp.update(gate_ber, k=K, per_bit_acc=acc,
                            n_active=(curr.n_active if curr is not None
                                      else None))
        pending = (
            {"ber": local_batch_rows(metrics["per_sample_ber"],
                                     axis=1 if K > 1 else 0),
             "miou": local_batch_rows(metrics["per_sample_miou"],
                                      axis=1 if K > 1 else 0)},
            selections,
            metrics["train/ber"],
            metrics["per_bit_acc"],
        )

        step_end = step + K  # K=1: this dispatch covered [step, step_end)
        last_step = step_end - 1

        if (step // max(trainer.log_every, 1)
                != step_end // max(trainer.log_every, 1)) or step == start_step:
            host = {}
            for k_name, v in metrics.items():
                if k_name.startswith("per_sample"):
                    continue  # batch-sharded; consumed via local_batch_rows
                arr = np.asarray(v)
                if arr.ndim == 0:
                    host[k_name] = float(arr)
                elif K > 1 and arr.ndim == 1 and arr.shape[0] == K:
                    host[k_name] = float(arr[-1])  # last step of the dispatch
            if ramp is not None:
                host["ramp/percep_scale"] = ramp.scale()
                host["ramp/ber_ema"] = ramp.ema
                if ramp.fx_gate > 0:
                    host["ramp/fx_on"] = float(fx_on)
                if msg_freeze:
                    host["ramp/msg_on"] = float(ramp.msg_on())
            if alt:
                host["ramp/gen_on"] = float(gen_on)
            # per-bit decision accuracy (attacked path): min + count of
            # below-chance bits — the live sign-flip-lockstep signature
            acc = np.asarray(metrics["per_bit_acc"])
            if acc.ndim == 2:
                acc = acc[-1]
            host["bits/acc_min"] = float(acc.min())
            host["bits/n_below_chance"] = float((acc < 0.45).sum())
            if curr is not None:
                host["ramp/nbits_active"] = float(curr.n_active)
                # inactive bits receive no decode gradient and drift around
                # chance — the lockstep/weak-bit signature lives in the
                # ACTIVE slice only
                host["bits/acc_min_active"] = float(
                    acc[: curr.n_active].min())
            tracker.update(last_step, host)
            logger.info(
                "step %d loss %.4f dec %.4f loc %.4f ber %.4f miou %.4f",
                last_step, host.get("loss", float("nan")),
                host.get("dec/loss", float("nan")),
                host.get("loc/loss", float("nan")),
                host.get("train/ber", float("nan")),
                host.get("train/miou", float("nan")),
            )

        if sample_fn is not None and (
            step // cfg.sample_freq != step_end // cfg.sample_freq
            or step_end >= total
        ):
            audio, msg = last_batch
            try:
                if is_proc0:
                    _dump_audio_samples(sample_fn, _local_state(state),
                                        audio, msg, trainer.ckpt_dir,
                                        step_end, cfg.generator.sample_rate,
                                        tracker=tracker)
            except Exception:
                logger.exception("audio sample dump failed; continuing")

        if is_proc0 and (step // cfg.valid_freq != step_end // cfg.valid_freq
                         or step_end >= total):
            # validation must never kill a long run (the reference guards its
            # val/save paths the same way, scripts/train.py:1839-1882).
            # process-0 only: val_fn is a host-local program (no mesh
            # shardings) and checkpoint writes must not race across hosts.
            vmetrics: Dict[str, float] = {}
            try:
                vaudio = val_ds.batch(cfg.val_batch_size)
                vmsg = generate_random_message(val_rng, cfg.val_batch_size,
                                               cfg.generator.msg_dimension)
                vkey = jax.random.fold_in(key, 1_000_000 + step)
                vmetrics = {k: float(np.asarray(v)) for k, v in
                            val_fn(_local_state(state), vaudio, vmsg,
                                   vkey).items()}
                tracker.update(last_step, vmetrics, include_time=False)
                logger.info("val @%d: %s", step_end,
                            {k: round(v, 4) for k, v in vmetrics.items()
                             if "/" not in k or k.count("/") == 1})
            except Exception:
                logger.exception("validation failed at step %d; continuing",
                                 step_end)
            host_state = {
                "step": step_end,
                "nbits_state": (curr.state_dict() if curr is not None
                                else None),
                "scheduler_state": scheduler.state_dict(),
                "best_val_loss": tracker.best_val_loss,
                # architecture snapshot: inference (api.core.WaveVerify)
                # rebuilds the exact model config from this, so knobs like
                # Generator.msg_mode survive without the training CLI
                "model_config": model_config_dict(cfg),
            }
            if ramp is not None:
                host_state["ramp_state"] = ramp.state_dict()
            try:
                ckpt.save_checkpoint(trainer.ckpt_dir, "latest", state,
                                     host_state)
                if vmetrics and tracker.is_best(
                    vmetrics.get("val/loss", float("inf"))
                ):
                    host_state["best_val_loss"] = tracker.best_val_loss
                    ckpt.save_checkpoint(trainer.ckpt_dir, "best", state,
                                         host_state)
                hit = [t for t in trainer.save_iters if step < t <= step_end]
                if hit:
                    ckpt.save_checkpoint(trainer.ckpt_dir,
                                         f"{hit[-1] // 1000}k", state,
                                         host_state)
            except Exception:
                logger.exception("checkpoint save failed at step %d; "
                                 "continuing", step_end)

        if n_proc > 1 and (step // cfg.valid_freq != step_end // cfg.valid_freq
                           or step_end >= total):
            # Re-align after process-0's validation/checkpoint block: the
            # other processes reach it instantly and would otherwise (a)
            # time out waiting in the next step's collective mid-run, or
            # (b) exit the interpreter and trip jax.distributed's ~60 s
            # shutdown barrier at end-of-run while process 0 is still
            # checkpointing (observed in the 2-process CPU test).
            _coordination_barrier(f"waveverify_post_val_{step_end}")

        step = step_end

    if profiling:
        jax.profiler.stop_trace()
    if pending is not None:
        _feed_scheduler(scheduler, pending[0], pending[1])
    tracker.close()
    return state


def _identity_branch(bank: EffectBank) -> int:
    """Index of the identity branch in the effect bank (0 in every shipped
    config; scanned defensively in case a YAML reorders the catalog)."""
    for i, (name, _) in enumerate(bank.specs):
        if name == "identity":
            return i
    return 0


def _local_state(state: TrainState) -> TrainState:
    """Host-local view of a (replicated) global TrainState: multi-host
    global arrays can't feed host-local jit programs (validation, sample
    dumps), so pull the replica to host numpy. Single-process: identity."""
    if jax.process_count() == 1:
        return state
    return jax.tree_util.tree_map(lambda x: np.asarray(x), state)


def _dump_audio_samples(sample_fn, state, audio: np.ndarray,
                        msg: np.ndarray, ckpt_dir: str, step: int,
                        sample_rate: int, n: int = 2,
                        tracker: Optional[Tracker] = None) -> None:
    """Write n (clean, watermarked) wav pairs — the reference's
    save_samples equivalent (scripts/train.py:1728-1846); pairs are also
    mirrored to wandb/TB when those sinks are live."""
    from waveverify_tpu.api.audio_io import save_audio

    out_dir = Path(ckpt_dir) / "samples" / f"step_{step}"
    out_dir.mkdir(parents=True, exist_ok=True)
    _, watermarked = sample_fn(state.wm_params, audio[:n], msg[:n])
    watermarked = np.asarray(watermarked)
    for i in range(min(n, len(audio))):
        save_audio(audio[i], out_dir / f"{i}_clean.wav", sample_rate)
        save_audio(watermarked[i], out_dir / f"{i}_watermarked.wav",
                   sample_rate)
        if tracker is not None:
            tracker.log_audio(step, f"samples/{i}_watermarked",
                              watermarked[i], sample_rate)
    logger.info("wrote %d audio sample pairs to %s", min(n, len(audio)),
                out_dir)


def _feed_scheduler(scheduler: EffectScheduler, metrics: Dict[str, Any],
                    selections) -> None:
    """Per-sample BER/mIoU -> scheduler EMA (reference
    model/watermarking.py:697-753, one update per sample).

    ``selections`` is one step's (name, params) list, or — with K steps per
    dispatch — a list of K such lists with metrics stacked [K, B]."""
    bers = np.asarray(metrics["ber"])
    mious = np.asarray(metrics["miou"])
    if selections and isinstance(selections[0], list):  # K-step dispatch
        for k, sel in enumerate(selections):
            _feed_scheduler(scheduler,
                            {"ber": bers[k], "miou": mious[k]}, sel)
        return
    for i, (name, params) in enumerate(selections):
        if i >= len(bers):
            break
        scheduler.update_effect_metrics(
            name, params,
            float(np.clip(bers[i], 0.0, 1.0)),
            float(np.clip(mious[i], 0.0, 1.0)),
        )
