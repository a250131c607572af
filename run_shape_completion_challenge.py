"""ECCV shape-completion challenge entry point.

Public CLI preserved from the reference
(`/root/reference/run_shape_completion_challenge.py`); implementation:
`hortimapping_tpu/pipeline/challenge.py` (one batched fused-LM solve over
the whole split, results under `<data_dir>/results/<run>/<split>/`).
"""

from os.path import abspath, dirname, join

import click
import yaml


@click.command()
@click.option(
    "--config", "-c", type=str, help="path to the config file (.yaml)",
    default=join(dirname(abspath(__file__)),
                 "configs/shape_completion_challenge_pepper.yaml"),
)
def main(config):
    from hortimapping_tpu.pipeline.challenge import run_challenge

    cfg = yaml.safe_load(open(config))
    run_challenge(cfg)


if __name__ == "__main__":
    main()
