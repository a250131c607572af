"""IGG-fruit lab evaluation, one optimization per sampled frame.

Public CLI preserved from the reference
(`/root/reference/eval_lab_single_frame.py`); implementation:
`hortimapping_tpu/pipeline/lab.py` with `multi_frame=False` — every
(fruit, frame) instance is one lane of a batched fused-LM solve.
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
    run_lab_eval(cfg, multi_frame=False)


if __name__ == "__main__":
    main()
