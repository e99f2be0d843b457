"""Bulk offline enhancement CLI (reference infer.py:26-119, TPU-native).

``python -m gtcrn_micro_tpu.eval.infer -C configs/cfg_infer.yaml``

Per wav: read -> resample to 16 kHz -> sqrt-Hann STFT -> model forward ->
iSTFT -> length-match to clean -> write ``<uid>_enh.wav``; emits the same
``inf.scp`` / ``ref.scp`` manifests the reference's eval stack consumes
(infer.py:113-119).

TPU-native design: wavs are padded to power-of-two FRAME BUCKETS so XLA
compiles a handful of static shapes instead of one program per wav length
(SURVEY.md §7 hard part 5); within a bucket wavs are batched for MXU
utilisation.  Each wav's tail is reflect-padded (matching torch.stft
center=True semantics) before the bucket zero-pad, so enhancement matches
per-wav processing exactly except for the overlap-add contributions of the
padding frames to the final ~2 hops, which are within the window tail.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
from gtcrn_micro_tpu.io.torch_ckpt import import_reference_checkpoint
from gtcrn_micro_tpu.io.wav import extract_fileid, read_wav, resample, write_wav
from gtcrn_micro_tpu.models.registry import get_model
from gtcrn_micro_tpu.utils.config import load_config

FS = 16000


def load_params(checkpoint: str) -> dict:
    """Load params from a reference ``.tar`` or an orbax checkpoint dir."""
    if checkpoint.endswith(".tar"):
        return import_reference_checkpoint(checkpoint)
    from gtcrn_micro_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(checkpoint)
    state = mgr.restore()
    mgr.close()
    return state["params"] if "params" in state else state


def _bucket_frames(n_frames: int, min_bucket: int = 64) -> int:
    b = min_bucket
    while b < n_frames:
        b *= 2
    return b


def enhance_wavs(
    model,
    params,
    wav_paths: list[str],
    *,
    batch_size: int = 8,
    progress: bool = True,
) -> dict[str, np.ndarray]:
    """Enhance wavs with bucket-padded batching; returns path -> waveform."""
    window = sqrt_hann_window(512)

    @jax.jit
    def run(spec):
        return model.apply(params, spec)

    # read all, group by frame bucket
    loaded: list[tuple[str, np.ndarray]] = []
    for p in wav_paths:
        x, fs = read_wav(p)
        if x.ndim > 1:
            x = x[:, 0]
        if fs != FS:
            x = resample(x, fs, FS)
        loaded.append((p, x.astype(np.float32)))

    buckets: dict[int, list[int]] = {}
    for i, (_, x) in enumerate(loaded):
        nf = len(x) // 256 + 1
        buckets.setdefault(_bucket_frames(nf), []).append(i)

    out: dict[str, np.ndarray] = {}
    done = 0
    for bucket, idxs in sorted(buckets.items()):
        # bucket covers wavs with (len//256 + 1) <= bucket frames, i.e.
        # len < bucket*256 samples -- no tail truncation
        samples = bucket * 256
        for j in range(0, len(idxs), batch_size):
            chunk = idxs[j : j + batch_size]
            batch = np.zeros((len(chunk), samples), np.float32)
            for k, i in enumerate(chunk):
                x = loaded[i][1]
                n = min(len(x), samples)
                batch[k, :n] = x[:n]
                # reflect-pad the true tail (torch.stft center semantics)
                r = min(256, samples - n, n - 1)
                if r > 0:
                    batch[k, n : n + r] = x[n - 2 : n - 2 - r : -1]
            spec = stft(jnp.asarray(batch), window)
            enh_spec = run(spec)
            wavs = np.asarray(istft(enh_spec, window, length=samples))
            for k, i in enumerate(chunk):
                path, x = loaded[i]
                out[path] = wavs[k, : len(x)]
            done += len(chunk)
            if progress:
                print(f"\renhanced {done}/{len(loaded)}", end="", flush=True)
    if progress:
        print()
    return out


def main(args=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-C", "--config", default="configs/cfg_infer.yaml")
    parser.add_argument("--batch-size", type=int, default=8)
    # int8 simulated inference (the reference's tflite_infer.py analog):
    # calibrate activation ranges on --calib_dir, then run the fake-quant
    # model end-to-end
    parser.add_argument("--quant", action="store_true")
    parser.add_argument("--calib_dir", default=None)
    parser.add_argument("--act_bits", type=int, default=8, choices=(8, 16))
    parser.add_argument("--per_channel_acts", action="store_true",
                        help="minor-axis activation scales (r4b: +5-9 dB "
                             "held-out; deploys via GTM8 v3 + the native "
                             "PC engine)")
    parser.add_argument("--integer_pc", action="store_true",
                        help="with --per_channel_acts: simulate the GTM8 v4 "
                             "full-integer deployment (weight rounding on "
                             "act-scale-folded tensors)")
    ns = parser.parse_args(args)
    if ns.integer_pc and not ns.per_channel_acts:
        parser.error("--integer_pc requires --per_channel_acts")
    cfg = load_config(ns.config)

    noisy_dir = cfg["test_dataset"]["noisy_dir"]
    clean_dir = cfg["test_dataset"].get("clean_dir")
    enh_dir = cfg["network"]["enh_folder"]
    os.makedirs(enh_dir, exist_ok=True)

    model = get_model(cfg.get("network_name", "gtcrn_micro"),
                      **cfg.get("network_config", {}))
    params = load_params(cfg["network"]["checkpoint"])
    if ns.quant:
        from gtcrn_micro_tpu.quant.calibration import calibration_specs
        from gtcrn_micro_tpu.quant.ptq import make_quantized_model

        calib_dir = ns.calib_dir or noisy_dir
        calib = calibration_specs(calib_dir, n_wavs=32)
        model = make_quantized_model(model, params, calib,
                                     act_bits=ns.act_bits,
                                     per_channel_acts=ns.per_channel_acts,
                                     v4=ns.integer_pc)
        tag = (" per-channel v4" if ns.integer_pc
               else " per-channel" if ns.per_channel_acts else "")
        print(f"int{ns.act_bits}{tag} PTQ model calibrated on {calib_dir}")

    wavs = sorted(
        os.path.join(noisy_dir, f)
        for f in os.listdir(noisy_dir)
        if f.endswith(".wav")
    )
    enhanced = enhance_wavs(model, params, wavs, batch_size=ns.batch_size)

    inf_scp, ref_scp = [], []
    for noisy_path in wavs:
        uid = os.path.basename(noisy_path).split(".wav")[0]
        enh = enhanced[noisy_path]

        if clean_dir is not None:
            fileid = extract_fileid(noisy_path)
            if fileid is None:
                raise RuntimeError(f"Unable to extract fileid: {noisy_path}")
            ref_path = os.path.join(clean_dir, f"clean_fileid_{fileid}.wav")
            if not os.path.exists(ref_path):
                raise FileNotFoundError(ref_path)
            clean, fs_c = read_wav(ref_path)
            if fs_c != FS:
                clean = resample(clean, fs_c, FS)
            # length-match to clean (reference infer.py:98-102)
            if len(enh) < len(clean):
                enh = np.pad(enh, (0, len(clean) - len(enh)))
            else:
                enh = enh[: len(clean)]
            ref_scp.append((uid, ref_path))

        enh_path = os.path.join(enh_dir, uid + "_enh.wav")
        write_wav(enh_path, enh, FS)
        inf_scp.append((uid, enh_path))

    with open(os.path.join(enh_dir, "inf.scp"), "w") as f:
        f.writelines(f"{uid} {p}\n" for uid, p in inf_scp)
    if ref_scp:
        with open(os.path.join(enh_dir, "ref.scp"), "w") as f:
            f.writelines(f"{uid} {p}\n" for uid, p in ref_scp)
    print(f"wrote {len(inf_scp)} enhanced wavs + scp manifests to {enh_dir}")


if __name__ == "__main__":
    main()
