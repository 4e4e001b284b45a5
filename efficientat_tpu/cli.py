"""Unified CLI — subcommands mirror the reference's per-task scripts.

- ``tag``           <- inference.py (single clip, top-10 printout)
- ``windowed-tag``  <- windowed_inference.py (long-form sliding window)
- ``train``         <- ex_audioset.py / ex_esc50.py / ... (per-task presets)
- ``evaluate``      <- ex_audioset.py evaluate() / ex_fsd50k.py evaluate()
- ``complexity``    <- complexity.py (MACs / analytic peak memory)
- ``receptive-field`` <- receptive_field_cnn.py

Run ``python -m efficientat_tpu.cli <subcommand> --help``.
"""

from __future__ import annotations

import argparse
import sys


def _add_tag(sub):
    p = sub.add_parser("tag", help="Tag a single audio clip (top-10 labels)")
    p.add_argument("--model_name", type=str, default="mn10_as")
    p.add_argument("--ensemble", nargs="+", default=[])
    p.add_argument("--audio_path", type=str, required=True)
    p.add_argument("--no-pretrained", action="store_true",
                   help="random weights (pipeline testing without checkpoints)")
    p.add_argument("--model_dir", type=str, default="resources")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 model compute (mel stays fp32)")
    p.set_defaults(fn=_run_tag)


def _run_tag(args):
    import jax.numpy as jnp

    from efficientat_tpu.infer.tag import Tagger

    names = args.ensemble if args.ensemble else args.model_name
    tagger = Tagger(names, pretrained=not args.no_pretrained,
                    model_dir=args.model_dir,
                    dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    tags = tagger.tag(args.audio_path)
    print("************* Acoustic Event Detected: *****************")
    for label, prob in tags:
        print(f"{label}: {prob:.3f}")
    print("********************************************************")


def _add_windowed(sub):
    p = sub.add_parser("windowed-tag", help="Tag a long recording in sliding windows")
    p.add_argument("--model_name", type=str, default="mn10_as")
    p.add_argument("--audio_path", type=str, required=True)
    p.add_argument("--window_size", type=float, default=10.0)
    p.add_argument("--hop_length", type=float, default=2.5)
    p.add_argument("--max_batch", type=int, default=None)
    p.add_argument("--no-pretrained", action="store_true")
    p.add_argument("--model_dir", type=str, default="resources")
    p.set_defaults(fn=_run_windowed)


def _run_windowed(args):
    from efficientat_tpu.infer.tag import Tagger
    from efficientat_tpu.infer.windowed import tag_audio_window

    tagger = Tagger(args.model_name, pretrained=not args.no_pretrained,
                    model_dir=args.model_dir)
    results = tag_audio_window(tagger, args.audio_path, args.window_size,
                               args.hop_length, max_batch=args.max_batch)
    for r in results:
        print(f"[{r['start']:8.2f}s - {r['end']:8.2f}s]")
        for label, prob in r["tags"][:3]:
            print(f"    {label}: {prob:.3f}")


def _add_train(sub):
    p = sub.add_parser("train", help="Train / fine-tune on a task preset")
    p.add_argument("task", choices=["audioset", "audioset_pl", "esc50",
                                    "fsd50k", "dcase20", "openmic"])
    p.set_defaults(fn=_run_train, passthrough=True)


def _run_train(args, extra):
    from efficientat_tpu.train.cli import run_train

    run_train(args.task, extra)


def _add_evaluate(sub):
    p = sub.add_parser("evaluate", help="Evaluate a model on a task's eval split")
    p.add_argument("task", choices=["audioset", "audioset_pl", "esc50",
                                    "fsd50k", "dcase20", "openmic"])
    p.set_defaults(fn=_run_evaluate, passthrough=True)


def _run_evaluate(args, extra):
    from efficientat_tpu.train.cli import run_evaluate

    run_evaluate(args.task, extra)


def _add_complexity(sub):
    p = sub.add_parser("complexity", help="MACs / params / analytic peak memory")
    p.add_argument("--model_name", type=str, default="mn10_as")
    p.add_argument("--measure", choices=["macs", "memory"], default="macs")
    p.add_argument("--bits", type=int, default=16)
    p.add_argument("--clip_seconds", type=float, default=10.0)
    # transformer mode: static PaSST/ViT-style MACs, no model needed
    # (reference helpers/flop_count.py:72-162 counts its KD teacher)
    p.add_argument("--transformer", action="store_true")
    p.add_argument("--embed_dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--stride", type=int, default=10)
    p.add_argument("--input_f", type=int, default=128)
    p.add_argument("--input_t", type=int, default=998)
    p.add_argument("--num_classes", type=int, default=527)
    p.set_defaults(fn=_run_complexity)


def _run_complexity(args):
    if args.transformer:
        from efficientat_tpu.tools.macs import (
            TransformerSpec, count_macs_transformer)

        spec = TransformerSpec(
            input_f=args.input_f, input_t=args.input_t,
            embed_dim=args.embed_dim, depth=args.depth,
            patch_size=args.patch_size, stride_f=args.stride,
            stride_t=args.stride, num_classes=args.num_classes)
        count_macs_transformer(spec, verbose=True)
        return

    from efficientat_tpu.tools.complexity import report_complexity

    report_complexity(args.model_name, measure=args.measure, bits=args.bits,
                      clip_seconds=args.clip_seconds)


def _add_profile(sub):
    p = sub.add_parser("profile", help="Capture a device trace of a model forward")
    p.add_argument("--model_name", type=str, default="mn10_as")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--clip_seconds", type=float, default=10.0)
    p.add_argument("--log_dir", type=str, default="/tmp/eatpu-trace")
    p.add_argument("--iters", type=int, default=4)
    p.set_defaults(fn=_run_profile)


def _run_profile(args):
    import numpy as np

    from efficientat_tpu.infer.tag import Tagger
    from efficientat_tpu.utils.profiling import trace

    tagger = Tagger(args.model_name, pretrained=False)
    sr = tagger.mel_cfg.sr
    waves = np.random.default_rng(0).normal(
        size=(args.batch_size, int(args.clip_seconds * sr))).astype(np.float32) * 0.1
    tagger.predict(waves)  # compile outside the trace
    with trace(args.log_dir):
        for _ in range(args.iters):
            tagger.predict(waves)
    print(f"trace written to {args.log_dir} (view with TensorBoard/Perfetto)")


def _add_rf(sub):
    p = sub.add_parser("receptive-field", help="Analytic receptive field (freq/time)")
    p.add_argument("--model_name", type=str, default="mn10_as")
    # manual MN configuration (reference receptive_field_cnn.py:26-35)
    p.add_argument("--model_width", type=float, default=None)
    p.add_argument("--head_type", type=str, default=None)
    p.add_argument("--strides", nargs=4, type=int, default=None)
    p.add_argument("--se_dims", type=str, default=None)
    # or an arbitrary conv stack, e.g. --layers 3:2,3:1:2,5x3:2x1
    p.add_argument("--layers", type=str, default=None,
                   help="generic CNN spec k:s[:d],... ; fields may be fxt pairs")
    p.set_defaults(fn=_run_rf)

    p = sub.add_parser(
        "convert-dataset",
        help="Convert a reference mp3-HDF5 to int16 PCM HDF5 (fast reads, "
             "int16 transport; ~8x larger on disk)")
    p.add_argument("--src", type=str, required=True, help="*_mp3.hdf input")
    p.add_argument("--dst", type=str, required=True, help="*_pcm.hdf output")
    p.add_argument("--sample_rate", type=int, default=32000)
    p.set_defaults(fn=_run_convert_dataset)


def _run_convert_dataset(args):
    from efficientat_tpu.data.hdf5 import convert_mp3_hdf5_to_pcm

    convert_mp3_hdf5_to_pcm(args.src, args.dst, args.sample_rate)
    print(f"wrote {args.dst}")


def _run_rf(args):
    from efficientat_tpu.tools.receptive_field import report_receptive_field

    report_receptive_field(args.model_name, model_width=args.model_width,
                           strides=args.strides, se_dims=args.se_dims,
                           head_type=args.head_type, layers=args.layers)


def _setup_compilation_cache():
    """Persistent XLA compilation cache (DyMN first-compiles run minutes;
    subsequent runs hit the cache). Opt out with EATPU_NO_COMPILE_CACHE=1,
    relocate with EATPU_COMPILE_CACHE_DIR.

    Enabled for ACCELERATOR backends only: XLA:CPU's serialized-executable
    reload has been observed to abort() on reruns of SPMD programs the
    same host cached moments earlier (see tests/conftest.py) — on CPU a
    recompile is always sound, so the cache stays off there."""
    import os

    if os.environ.get("EATPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.default_backend() == "cpu":
            return
        cache = os.environ.get(
            "EATPU_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "eatpu_xla"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    parser = argparse.ArgumentParser(prog="efficientat_tpu",
                                     description=__doc__,
                                     formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_tag(sub)
    _add_windowed(sub)
    _add_train(sub)
    _add_evaluate(sub)
    _add_complexity(sub)
    _add_profile(sub)
    _add_rf(sub)

    args, extra = parser.parse_known_args(argv)
    # after parsing so --help/usage errors never touch the backend (the
    # cpu-vs-accelerator check below initializes it, which on a tunneled
    # TPU costs seconds)
    _setup_compilation_cache()
    if getattr(args, "passthrough", False):
        return args.fn(args, extra)
    if extra:
        parser.error(f"unrecognized arguments: {extra}")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
