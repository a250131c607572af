"""BUP20 wild sweet-pepper completion entry point.

Public CLI preserved from the reference (`-c/--config` YAML path,
`/root/reference/test_wild_completion.py:23-28`); the implementation is the
TPU-native batched pipeline (`hortimapping_tpu/pipeline/wild.py`): all fruit
submaps are optimized in one fused vmapped LM solve instead of a sequential
per-fruit loop, then written to `submaps_complete/`, `submaps_clean/`,
`submaps_pose/`.
"""

from os.path import abspath, dirname, join

import click
import yaml


@click.command()
@click.option(
    "--config", "-c", type=str, help="path to the config file (.yaml)",
    default=join(dirname(abspath(__file__)), "configs/wild_pepper.yaml"),
)
def main(config):
    from hortimapping_tpu.pipeline.wild import run_wild_completion

    cfg = yaml.safe_load(open(config))
    results = run_wild_completion(cfg)
    ok = sum(r.valid for r in results)
    print(f"completed {ok}/{len(results)} submaps")


if __name__ == "__main__":
    main()
