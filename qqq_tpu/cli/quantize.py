"""Quantization pipeline CLI — the examples/quant_model.py analogue.

Orchestrates: [rotation] → [smooth] → GPTQ → pack → save, with the
reference's flag semantics (quant_model.py:21-266):
  --w_group_size -1 → per-channel; 128 → per-group (g128)
  --gptq_mse pairs with rotation; smoothing uses minmax (scripts/quant_model.sh)
  --smooth_method ∈ {os+, awq, sq, none}; --rotate ∈ {hadamard, random, none}

Usage:
  python -m qqq_tpu.cli.quantize --model_path <hf_dir> --save_path <out> \
      --rotate hadamard --w_group_size 128 --gptq_mse true
"""

from __future__ import annotations

import argparse
import logging
import time

import jax.numpy as jnp
import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("qqq_tpu")


def str2bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "y")


def _canon_a_quantizer(name: str) -> str:
    from qqq_tpu.calib.smooth import (
        A_QUANTIZER_REFERENCE_NAMES, A_QUANTIZERS,
    )

    canon = A_QUANTIZER_REFERENCE_NAMES.get(name, name)
    if canon not in A_QUANTIZERS:
        raise SystemExit(
            f"unknown a_quantizer {name!r}; choose from {A_QUANTIZERS} "
            "(or reference class names)"
        )
    return canon


def _canon_observer(name: str) -> str:
    """Accept both our registry keys and reference class names."""
    from qqq_tpu.calib.observers import OBSERVERS, REFERENCE_NAMES

    canon = REFERENCE_NAMES.get(name, name)
    if canon not in OBSERVERS:
        raise SystemExit(
            f"unknown observer {name!r}; choose from "
            f"{sorted(OBSERVERS)} (or reference class names)"
        )
    return canon


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--save_path", required=True)
    p.add_argument("--dtype", default="bfloat16")
    # weight quant (quant_model.py:66-117)
    p.add_argument("--wbits", type=int, default=4)
    p.add_argument("--w_group_size", type=int, default=-1)
    # calib data (quant_model.py:226-266)
    p.add_argument("--calib_dataset", default="wikitext2")
    p.add_argument("--custom_dataset", default=None,
                   help="local text/jsonl[.zst] calibration file "
                        "(reference --custom_dataset)")
    p.add_argument("--allow_synthetic", action="store_true",
                   help="permit the random-token fallback when the dataset "
                        "can't be fetched (smoke runs only)")
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_length", type=int, default=2048)
    p.add_argument("--sample_batch", type=int, default=4)
    # rotation (quant_model.py:214-224)
    p.add_argument("--rotate", default="none",
                   choices=["hadamard", "random", "none"])
    # smooth (quant_model.py:119-152)
    p.add_argument("--smooth_method", default="none",
                   choices=["os+", "awq", "sq", "none"])
    p.add_argument("--a_quantizer", default="token",
                   help="activation fake-quantizer during smoothing: "
                        "token|tensor|group|token_group (reference class "
                        "names accepted, fake_quant.py:59-195)")
    p.add_argument("--a_group_size", type=int, default=128,
                   help="channel-group size for group/token_group")
    p.add_argument("--a_observer", default="minmax",
                   help="activation range estimator during smoothing: one "
                        "of the per-token-capable observers "
                        "(minmax|quantile|lsq_plus|mse), reference class "
                        "names accepted (quant_model.py:34-39)")
    p.add_argument("--a_percentile", type=float, default=0.999,
                   help="clip quantile when --a_observer quantile")
    p.add_argument("--w_observer", default="minmax",
                   help="weight range estimator during smoothing: "
                        "minmax|lsq_plus|mse (quant_model.py:82-88)")
    # gptq (quant_model.py:155-207)
    p.add_argument("--gptq_mse", type=str2bool, default=False)
    p.add_argument("--gptq_groupsize", type=int, default=None)
    p.add_argument("--gptq_act_order", type=str2bool, default=True)
    p.add_argument("--gptq_percdamp", type=float, default=0.01)
    p.add_argument("--gptq_blocksize", type=int, default=128)
    p.add_argument("--offload", type=str2bool, default=False,
                   help="stream dense weights host→device layer by layer "
                        "(models larger than one chip's HBM)")
    p.add_argument("--quantize_lm_head", type=str2bool, default=False,
                   help="also W4A8-quantize the LM head (beyond-reference "
                        "option; the reference keeps it FP)")
    # GPTQ intermediate artifact (apply_gptq.py:34 quantizers.pth analogue)
    p.add_argument("--save_quantizers", type=str2bool, default=True,
                   help="save <save_path>_quantizers.npz (per-linear q4 "
                        "codes + scales) for pack-only resume")
    p.add_argument("--quantizers_path", default=None)
    p.add_argument("--pack_only", action="store_true",
                   help="skip calibration/GPTQ; rebuild the packed "
                        "checkpoint from --quantizers_path")
    p.add_argument("--save_format", default="native",
                   choices=["native", "marlin"],
                   help="'marlin' writes a reference/vLLM-loadable "
                        "checkpoint (qlinear_marlin.py buffer layout)")
    return p.parse_args()


def main():
    args = parse_args()
    args.tokenizer_path = args.tokenizer_path or args.model_path
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from qqq_tpu.core import QuantSpec
    from qqq_tpu.models import load_hf_model, save_quantized
    from qqq_tpu.calib.pipeline import apply_gptq
    from qqq_tpu.calib.rotation import fuse_layer_norms, rotate_model
    from qqq_tpu.calib.smooth import smooth_model, export_smoothed_model
    from qqq_tpu.utils.data import get_loaders

    t0 = time.time()
    params, config = load_hf_model(
        args.model_path, dtype=dtype, host=args.offload
    )
    logger.info("loaded %s in %.1fs", args.model_path, time.time() - t0)
    if args.offload and (args.rotate != "none" or args.smooth_method != "none"):
        raise SystemExit(
            "--offload currently supports the GPTQ-only recipe; rotate/smooth "
            "the model on a multi-chip mesh or a larger host first"
        )

    spec = QuantSpec(
        bits=args.wbits, group_size=args.w_group_size, mse=args.gptq_mse
    )
    quantizers_path = args.quantizers_path or (
        args.save_path + "_quantizers.npz"
    )

    if args.pack_only:
        # resume after a crash between GPTQ and pack (apply_gptq.py:34's
        # quantizers.pth analogue): re-apply the deterministic transforms
        # (rotation is seeded; smooth scales come from scale_list.npz),
        # then pack straight from the saved codes — no GPTQ re-run.
        from qqq_tpu.calib.pipeline import pack_from_quantizers

        if args.rotate != "none":
            params = fuse_layer_norms(params, config)
            params, _ = rotate_model(
                params, config, mode=args.rotate, seed=args.seed
            )
        sl_path = f"{args.save_path}_scale_list.npz"
        if args.smooth_method != "none":
            z = np.load(sl_path)
            scale_list = [jnp.asarray(z[k]) for k in z.files]
            params = export_smoothed_model(params, config, scale_list)
        params = pack_from_quantizers(params, config, spec, quantizers_path)
        if args.save_format == "marlin":
            from qqq_tpu.models.marlin_compat import save_marlin_checkpoint

            save_marlin_checkpoint(
                args.save_path, params, config, group_size=args.w_group_size
            )
        else:
            save_quantized(
                args.save_path, params, config,
                {
                    "quant_method": "qqq",
                    "wbits": args.wbits,
                    "group_size": args.w_group_size,
                    "rotation": args.rotate,
                    "smooth_method": args.smooth_method,
                },
            )
        logger.info("re-packed from %s in %.1fs", quantizers_path,
                    time.time() - t0)
        return

    calib, _ = get_loaders(
        args.calib_dataset,
        tokenizer_path=args.tokenizer_path,
        nsamples=args.nsamples,
        seed=args.seed,
        seqlen=args.max_length,
        vocab_size=config.vocab_size,
        allow_synthetic=args.allow_synthetic,
        custom_data_path=args.custom_dataset,
    )

    Q = None
    if args.rotate != "none":
        # quant_model.py:291-293
        params = fuse_layer_norms(params, config)
        params, Q = rotate_model(
            params, config, mode=args.rotate, seed=args.seed
        )
        logger.info("rotated model (mode=%s)", args.rotate)

    if args.smooth_method != "none":
        # quant_model.py:297-316: search on ONE batch, then fold
        scale_list = smooth_model(
            params, config, jnp.asarray(calib[:1]),
            method=args.smooth_method, w_spec=spec,
            a_percentile=(
                args.a_percentile
                if "uantile" in args.a_observer else None
            ),
            a_observer=_canon_observer(args.a_observer),
            w_observer=_canon_observer(args.w_observer),
            a_quantizer=_canon_a_quantizer(args.a_quantizer),
            a_group_size=args.a_group_size,
        )
        np.savez(
            f"{args.save_path}_scale_list.npz",
            *[np.asarray(s) for s in scale_list],
        )  # the scale_list.pth analogue (smooth.py:84-87)
        params = export_smoothed_model(params, config, scale_list)
        logger.info("smoothed model (method=%s)", args.smooth_method)

    params, stats = apply_gptq(
        params,
        config,
        jnp.asarray(calib),
        spec,
        percdamp=args.gptq_percdamp,
        actorder=args.gptq_act_order,
        blocksize=args.gptq_blocksize,
        sample_batch=args.sample_batch,
        pack=True,
        dtype=dtype,
        stream_from_host=args.offload,
        quantize_lm_head=args.quantize_lm_head,
        quantizers_path=(quantizers_path if args.save_quantizers else None),
    )

    if args.save_format == "marlin":
        from qqq_tpu.models.marlin_compat import save_marlin_checkpoint

        save_marlin_checkpoint(
            args.save_path, params, config, group_size=args.w_group_size
        )
    else:
        save_quantized(
            args.save_path, params, config,
            {
                "quant_method": "qqq",       # quant_model.py:323-327
                "wbits": args.wbits,
                "group_size": args.w_group_size,
                "rotation": args.rotate,
                "smooth_method": args.smooth_method,
            },
        )
    logger.info(
        "saved quantized checkpoint (%s format) to %s (total %.1fs)",
        args.save_format, args.save_path, time.time() - t0,
    )


if __name__ == "__main__":
    main()
