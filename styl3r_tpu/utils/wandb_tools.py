"""wandb checkpoint fetching (reference `src/misc/wandb_tools.py:1-62`).

Resolves `wandb://run_id[:version]` checkpoint paths by downloading the run's
latest (or requested) COMMITTED model artifact. wandb is an optional
dependency — plain paths pass through untouched and the wandb import only
happens when a wandb:// path is actually used.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


def version_to_int(artifact) -> int:
    """Convert versions of the form vX to X. For example, v12 to 12."""
    return int(artifact.version[1:])


def download_checkpoint(
    run_id: str, download_dir: Path, version: Optional[str]
) -> Path:
    import wandb  # optional dependency; raises ImportError when absent

    api = wandb.Api()
    run = api.run(run_id)

    # Find the latest saved model checkpoint (or the requested version).
    chosen = None
    for artifact in run.logged_artifacts():
        if artifact.type != "model" or artifact.state != "COMMITTED":
            continue
        if version is None:
            if chosen is None or version_to_int(artifact) > version_to_int(chosen):
                chosen = artifact
        elif version == artifact.version:
            chosen = artifact
            break
    if chosen is None:
        raise FileNotFoundError(f"no committed model artifact on run {run_id}")

    download_dir.mkdir(exist_ok=True, parents=True)
    root = download_dir / run_id
    chosen.download(root=root)
    return root / "model.ckpt"


def update_checkpoint_path(path: Optional[str], wandb_cfg) -> Optional[Path]:
    """Map a checkpoint path spec to a local file, fetching wandb://run[:vN]
    specs via the wandb API. `wandb_cfg` is the RootCfg.wandb block (or any
    object/dict with a `project`)."""
    if path is None:
        return None
    if not str(path).startswith("wandb://"):
        return Path(path)

    run_id, *version = str(path)[len("wandb://"):].split(":")
    if len(version) == 0:
        version = None
    elif len(version) == 1:
        version = version[0]
    else:
        raise ValueError("Invalid version specifier!")

    project = (
        wandb_cfg.get("project")
        if isinstance(wandb_cfg, dict)
        else getattr(wandb_cfg, "project")
    )
    return download_checkpoint(f"{project}/{run_id}", Path("checkpoints"), version)
