"""Helpers to build the PyTorch reference modules for golden-parity tests.

The reference snapshot at /root/reference is treated as an oracle: we
instantiate its `modules/` layer (pure torch + einops + scipy — its `model/`
layer needs audiotools, which is unavailable), pull the *fused* weights out,
and load them into the JAX modules. Numerical agreement then validates the
entire padding / weight-norm / STFT-basis semantics of the TPU build.
"""

import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    import os

    return os.path.isdir(REFERENCE_ROOT)


def import_reference_modules():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import modules as ref_modules  # type: ignore

    return ref_modules


def install_fake_audiotools():
    """Install a minimal `audiotools` stand-in (test fixture only).

    The reference's model layer imports descript-audiotools, which is not in
    this image. Its models only touch AudioSignal.{audio_data, sample_rate,
    device, to} and ml.BaseModel, so a tiny shim suffices to run them as
    parity oracles. This shim is NOT part of the framework — the TPU build
    has no audiotools concept at all.
    """
    import types

    import torch

    if "audiotools" in sys.modules:
        return sys.modules["audiotools"]

    class AudioSignal:
        def __init__(self, audio_data, sample_rate=16000, stft_params=None):
            if isinstance(audio_data, np.ndarray):
                audio_data = torch.from_numpy(audio_data)
            if audio_data.dim() == 2:
                audio_data = audio_data.unsqueeze(1)
            self.audio_data = audio_data
            self.sample_rate = sample_rate
            self.stft_params = stft_params

        @property
        def device(self):
            return self.audio_data.device

        def to(self, device):
            self.audio_data = self.audio_data.to(device)
            return self

        def clone(self):
            return AudioSignal(self.audio_data.clone(), self.sample_rate)

        def resample(self, target_rate):
            if target_rate != self.sample_rate:
                raise NotImplementedError(
                    "shim supports rate=1 only (no julius in image)"
                )
            return self

        def stft(self):
            """descript-audiotools AudioSignal.stft semantics: optional
            match_stride pre-pad (reflect (w-h)/2 each side + right
            alignment so n_frames == ceil(T/hop)), torch.stft center=True,
            then drop 2 boundary frames per side when match_stride."""
            import math

            sp = self.stft_params or STFTParams()
            wl, hop = sp.window_length, sp.hop_length
            x = self.audio_data  # [B, C, T]
            b, c, t = x.shape
            if sp.match_stride:
                right_pad = math.ceil(t / hop) * hop - t
                pad = (wl - hop) // 2
            else:
                right_pad = pad = 0
            xp = torch.nn.functional.pad(
                x.reshape(-1, t), (pad, pad + right_pad), mode="reflect"
            )
            s = torch.stft(xp, n_fft=wl, hop_length=hop,
                           window=torch.hann_window(wl),
                           return_complex=True, center=True)
            s = s.reshape(b, c, s.shape[-2], s.shape[-1])
            if sp.match_stride:
                s = s[..., 2:-2]
            return s

    class STFTParams:
        def __init__(self, window_length=2048, hop_length=512,
                     match_stride=False):
            self.window_length = window_length
            self.hop_length = hop_length
            self.match_stride = match_stride

    mod = types.ModuleType("audiotools")
    mod.AudioSignal = AudioSignal
    mod.STFTParams = STFTParams
    ml = types.ModuleType("audiotools.ml")
    ml.BaseModel = torch.nn.Module
    mod.ml = ml
    sys.modules["audiotools"] = mod
    sys.modules["audiotools.ml"] = ml
    return mod


def import_reference_models():
    """Import the reference model classes with the audiotools shim.

    Loads model/{generator,detector,locator}.py directly via importlib —
    the package __init__ pulls in watermarking.py and the whole utils stack
    (julius, torchaudio, ...) which this image doesn't have.
    """
    import importlib.util
    import types

    install_fake_audiotools()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    ns = types.SimpleNamespace()
    for name in ("generator", "detector", "locator"):
        mod_name = f"_ref_model_{name}"
        if mod_name in sys.modules:
            mod = sys.modules[mod_name]
        else:
            spec = importlib.util.spec_from_file_location(
                mod_name, f"{REFERENCE_ROOT}/model/{name}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = mod
            spec.loader.exec_module(mod)
        setattr(ns, name.capitalize(), getattr(mod, name.capitalize()))
    return ns


def set_plain_convtr(params: dict, torch_convtr) -> None:
    """Load a plain (non-parametrized) torch ConvTranspose1d."""
    params["v"] = torch_convtr.weight.detach().cpu().numpy().astype(np.float32)
    if torch_convtr.bias is not None:
        params["b"] = torch_convtr.bias.detach().cpu().numpy().astype(np.float32)


def set_norm_conv2d(params: dict, torch_conv) -> None:
    """Load a torch weight-normed Conv2d into NormConv2d params.

    torch weight: (Cout, Cin/g, Kh, Kw) -> HWIO (Kh, Kw, Cin/g, Cout).
    """
    w = fused_weight(torch_conv)
    v = np.transpose(w, (2, 3, 1, 0))
    params["v"] = np.ascontiguousarray(v.astype(np.float32))
    if "g" in params:
        params["g"] = np.sqrt(
            (v.astype(np.float64) ** 2).sum(axis=(0, 1, 2))
        ).astype(np.float32)
    if torch_conv.bias is not None and "b" in params:
        params["b"] = torch_conv.bias.detach().cpu().numpy().astype(np.float32)


def set_plain_conv(params: dict, torch_conv) -> None:
    """Load a plain torch Conv1d into NormConv1d(norm='none') params."""
    w = torch_conv.weight.detach().cpu().numpy()  # (Cout, Cin, K)
    params["v"] = np.ascontiguousarray(np.transpose(w, (2, 1, 0)).astype(np.float32))
    if torch_conv.bias is not None:
        params["b"] = torch_conv.bias.detach().cpu().numpy().astype(np.float32)


def fused_weight(conv) -> np.ndarray:
    """Return the parametrization-fused weight of a torch conv."""
    import torch

    with torch.no_grad():
        return conv.weight.detach().cpu().numpy()


def set_norm_conv(params: dict, torch_conv, transposed: bool = False) -> None:
    """Load a torch (possibly weight-normed) conv into NormConv1d params.

    We set v to the fused torch weight and g to its norm, so the recomputed
    kernel g*v/||v|| equals the torch fused weight exactly.
    """
    w = fused_weight(torch_conv)  # torch: (Cout, Cin/g, K) or (Cin, Cout/g, K)
    if transposed:
        v = w  # our transposed layout == torch layout
        axes = (1, 2)
    else:
        v = np.transpose(w, (2, 1, 0))  # -> (K, Cin/g, Cout)
        axes = (0, 1)
    params["v"] = np.ascontiguousarray(v.astype(np.float32))
    if "g" in params:
        params["g"] = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes)).astype(
            np.float32
        )
    if torch_conv.bias is not None and "b" in params:
        params["b"] = torch_conv.bias.detach().cpu().numpy().astype(np.float32)


def set_dense(params: dict, torch_linear) -> None:
    params["kernel"] = (
        torch_linear.weight.detach().cpu().numpy().T.astype(np.float32)
    )
    if torch_linear.bias is not None:
        params["bias"] = torch_linear.bias.detach().cpu().numpy().astype(np.float32)


def load_resblock(params: dict, ref_block, act_all: bool = False) -> None:
    """Load a reference SEANetResnetBlock into our SEANetResnetBlock params."""
    per_k = 4 if act_all else 3
    n_dil = len(ref_block.block) // per_k
    for k in range(n_dil):
        base = k * per_k
        set_norm_conv(params[f"block_{k}_pw"]["conv"], ref_block.block[base + 1].conv.conv)
        dw_off = 3 if act_all else 2
        set_norm_conv(params[f"block_{k}_dw"]["conv"], ref_block.block[base + dw_off].conv.conv)
    if ref_block.res_scale_param is not None:
        params["res_scale_param"] = (
            ref_block.res_scale_param.detach().cpu().numpy().astype(np.float32)
        )
    import torch.nn as tnn

    if hasattr(ref_block, "shortcut") and not isinstance(ref_block.shortcut, tnn.Identity):
        set_norm_conv(params["shortcut"]["conv"], ref_block.shortcut.conv.conv)


def load_spec_block(params: dict, ref_spec) -> None:
    if ref_spec.spec is None:
        return
    if ref_spec.learnable:
        w = ref_spec.spec.weight.detach().cpu().numpy()  # (2F, 1, n_fft)
        params["stft"]["weight"] = np.transpose(w, (2, 1, 0)).astype(np.float32)
    set_norm_conv(params["proj"]["conv"], ref_spec.layer.conv.conv)
    if ref_spec.scale_param is not None:
        params["scale_param"] = (
            ref_spec.scale_param.detach().cpu().numpy().astype(np.float32)
        )


def load_encoder(params: dict, ref_enc, n_residual_layers: int, n_scales: int,
                 act_all: bool = False, l2norm: bool = True) -> None:
    """Load a reference SEANetEncoder state into our flax param dict."""
    set_norm_conv(params["conv_pre"]["conv"], ref_enc.conv_pre[1].conv.conv)
    for i in range(n_scales):
        for j in range(n_residual_layers):
            load_resblock(params[f"block_{i}_{j}"], ref_enc.blocks[i][j], act_all)
        load_spec_block(params[f"spec_block_{i}"], ref_enc.spec_blocks[i])
        set_norm_conv(params[f"down_{i}_expand"]["conv"], ref_enc.downsample[i][2].conv.conv)
        set_norm_conv(params[f"down_{i}_dw"]["conv"], ref_enc.downsample[i][3].conv.conv)
        if hasattr(ref_enc, "film_layers"):
            for b in range(len(ref_enc.film_layers[i])):
                set_dense(params[f"film_{i}_{b}"]["gamma"], ref_enc.film_layers[i][b].gamma_layer)
                set_dense(params[f"film_{i}_{b}"]["beta"], ref_enc.film_layers[i][b].beta_layer)
    load_spec_block(params["spec_post"], ref_enc.spec_post)
    set_norm_conv(params["post_dw"]["conv"], ref_enc.conv_post[1].conv.conv)
    set_norm_conv(params["post_proj"]["conv"]["conv"], ref_enc.conv_post[2].conv.conv)
    if ref_enc.conv_post[2].conv.conv.bias is not None and "b" in params["post_proj"]:
        params["post_proj"]["b"] = (
            ref_enc.conv_post[2].conv.conv.bias.detach().cpu().numpy().astype(np.float32)
        )
    # message MLP
    if hasattr(ref_enc, "msg_embedding"):
        set_dense(params["msg_in"], ref_enc.msg_embedding[0])
        hidden_idx = 0
        for layer in list(ref_enc.msg_embedding)[1:]:
            import torch.nn as tnn

            if isinstance(layer, tnn.Linear):
                set_dense(params[f"msg_hidden_{hidden_idx}"], layer)
                hidden_idx += 1


def load_decoder(params: dict, ref_dec, n_residual_layers: int, n_scales: int,
                 act_all: bool = False) -> None:
    model = ref_dec.model
    set_norm_conv(params["conv_in"]["conv"], model[0].conv.conv)
    set_norm_conv(params["conv_in_dw"]["conv"], model[1].conv.conv)
    idx = 2
    for i in range(n_scales):
        # entries: scale, act, convtr, conv1x1, res blocks...
        set_norm_conv(params[f"up_{i}_dw"]["convtr"], model[idx + 2].convtr.convtr,
                      transposed=True)
        set_norm_conv(params[f"up_{i}_proj"]["conv"], model[idx + 3].conv.conv)
        for j in range(n_residual_layers):
            load_resblock(params[f"block_{i}_{j}"], model[idx + 4 + j], act_all)
        idx += 4 + n_residual_layers
    set_norm_conv(params["conv_out"]["conv"], model[idx + 2].conv.conv)
