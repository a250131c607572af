"""Commercial-greenhouse (CKA) evaluation, full multi-frame pipeline.

Public CLI preserved from the reference
(`/root/reference/eval_wild_multi_frames.py`); implementation:
`hortimapping_tpu/pipeline/greenhouse.py` with `multi_frame=True` —
HortiMapping submaps (or offline photogrammetry recon) as surface input,
metashape-aligned camera poses, shape + pose metrics.
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
    run_greenhouse_eval(cfg, multi_frame=True)


if __name__ == "__main__":
    main()
