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

    init_params = None
    if cfg.model.encoder.pretrained_weights:
        import jax.numpy as jnp

        from styl3r_tpu.utils.checkpoint import (
            convert_styl3r_encoder,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(cfg.model.encoder.pretrained_weights)
        init_params = jax.tree.map(jnp.asarray, convert_styl3r_encoder(sd))
        print(f"warm-started from {cfg.model.encoder.pretrained_weights}")

    state = trainer.fit(max_steps=args.max_steps, init_params=init_params)
    trainer.save_checkpoint(state, trainer.output_dir / "checkpoints" / "final")
    print("done")


if __name__ == "__main__":
    main()
