"""Commercial-greenhouse (CKA) evaluation, single-frame mode.

Public CLI preserved from the reference
(`/root/reference/eval_wild_single_frame.py`); implementation:
`hortimapping_tpu/pipeline/greenhouse.py` with `multi_frame=False` — shape
AND pose metrics (translation error [mm], rotation error [deg]) against
measured ground-truth fruits.
"""

from os.path import abspath, dirname, join

import click
import yaml


@click.command()
@click.option(
    "--config", "-c", type=str, help="path to the config file (.yaml)",
    default=join(dirname(abspath(__file__)), "configs/cka_pepper.yaml"),
)
def main(config):
    from hortimapping_tpu.pipeline.greenhouse import run_greenhouse_eval

    cfg = yaml.safe_load(open(config))
    run_greenhouse_eval(cfg, multi_frame=False)


if __name__ == "__main__":
    main()
