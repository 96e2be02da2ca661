"""waveverify_tpu — TPU-native audio watermarking framework.

A from-scratch JAX/Flax/Pallas rebuild of the WaveVerify audio-watermarking
system (reference: pujariaditya/WaveVerify), redesigned TPU-first:

- All neural compute (SEANet generator / detector / locator / discriminator)
  is expressed as pure jittable functions over explicit parameter pytrees,
  with convolutions in NWC layout so channels ride the TPU lane dimension.
- The attack-simulation pipeline (filters, noise, speed, resample, temporal
  shuffles) runs *on device*, vmapped over the batch with per-sample effect
  dispatch via `lax.switch` — the reference's per-step GPU→CPU round trip
  (reference model/watermarking.py:540) is designed away.
- Data parallelism is a `jax.sharding.Mesh` + `pjit`; gradients all-reduce
  over ICI automatically.

Public API (mirrors the reference `waveverify` package):

    from waveverify_tpu import WaveVerify, WatermarkID
"""

__version__ = "0.1.0"

from waveverify_tpu.api.watermark_id import WatermarkID

__all__ = ["WaveVerify", "WatermarkID", "__version__"]


def __getattr__(name):
    # WaveVerify pulls in jax/flax; import lazily so lightweight consumers
    # (e.g. WatermarkID-only users) pay nothing.
    if name == "WaveVerify":
        from waveverify_tpu.api.core import WaveVerify

        return WaveVerify
    if name == "convert_torch_checkpoint":
        from waveverify_tpu.convert import convert_torch_checkpoint

        return convert_torch_checkpoint
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
