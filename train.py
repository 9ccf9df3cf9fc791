"""Training entry point (replaces `python -m src.main_style`).

Usage:
  python train.py --config configs/experiment/re10k_2view_nvs.yaml \
      [key.sub=value ...]

Stage-1 NVS pretraining, stage-2 stylization, and evaluation are selected by
the experiment config (see configs/experiment/). Checkpoint warm-starts:
  * checkpointing.load=<orbax dir>          resume our own params;
  * model.encoder.pretrained_weights=<.ckpt/.pth>  torch checkpoint
    (MASt3R / NoPoSplat / Styl3R release) converted on load.
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/main.yaml")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    import jax

    from styl3r_tpu.utils.config import load_config
    from styl3r_tpu.train.trainer import Trainer

    cfg = load_config(args.config, args.overrides)
    print(f"devices: {jax.devices()}")
    print(f"mode={cfg.mode} datasets={len(cfg.datasets)} batch={cfg.train.batch_size}")

    trainer = Trainer(cfg)

    # Warm start (reference main_style.py:128-168): encoder weights from a
    # Styl3R/NoPoSplat .ckpt or raw MASt3R .pth (auto-detected, possibly
    # partial — merged over the model init inside fit()); the token stylizer
    # optionally seeds from its own checkpoint.
    warm_start = None
    if cfg.model.encoder.pretrained_weights:
        from styl3r_tpu.utils.checkpoint import (
            load_torch_state_dict,
            warm_start_encoder_params,
        )

        sd = load_torch_state_dict(cfg.model.encoder.pretrained_weights)
        warm_start = warm_start_encoder_params(sd, cfg.model.encoder.sh_degree)
        print(f"warm-started encoder from {cfg.model.encoder.pretrained_weights}")
    if cfg.model.encoder.stylizer_pretrained_weights:
        from styl3r_tpu.utils.checkpoint import (
            convert_stylizer_weights,
            load_torch_state_dict,
            merge_params,
        )

        sty = convert_stylizer_weights(
            load_torch_state_dict(cfg.model.encoder.stylizer_pretrained_weights)
        )
        warm_start = merge_params(warm_start, sty) if warm_start else sty
        print(
            "warm-started stylizer from "
            f"{cfg.model.encoder.stylizer_pretrained_weights}"
        )

    init_params = None
    if cfg.checkpointing.load:
        init_params = trainer.load_params_lazy(cfg.checkpointing.load)
        print(f"resumed params from {cfg.checkpointing.load}")

    state = trainer.fit(
        max_steps=args.max_steps, init_params=init_params, warm_start=warm_start
    )
    trainer.save_checkpoint(state, trainer.output_dir / "checkpoints" / "final")
    print("done")


if __name__ == "__main__":
    main()
