"""IGG-fruit lab evaluation, fused multi-frame optimization per fruit.

Public CLI preserved from the reference
(`/root/reference/eval_lab_multi_frames.py`); implementation:
`hortimapping_tpu/pipeline/lab.py` with `multi_frame=True` — the integrated
map crop is the surface cloud and all sampled frames feed one render term.
"""

from os.path import abspath, dirname, join

import click
import yaml


@click.command()
@click.option(
    "--config", "-c", type=str, help="path to the config file (.yaml)",
    default=join(dirname(abspath(__file__)), "configs/lab_pepper.yaml"),
)
def main(config):
    from hortimapping_tpu.pipeline.lab import run_lab_eval

    cfg = yaml.safe_load(open(config))
    run_lab_eval(cfg, multi_frame=True)


if __name__ == "__main__":
    main()
