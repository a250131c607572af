"""Train a DeepSDF decoder on TPU from a DeepSDF experiment directory.

The reference ships pretrained decoders with no training code (its
`specs.json` training fields come from the upstream torch DeepSDF trainer,
which is a separate repository). This entry point fills that gap with a
TPU-native trainer for the same conventions — see
`hortimapping_tpu/train/deepsdf.py`. Usage mirrors upstream:

    python train_deep_sdf.py -e <experiment_dir> [-d <data_source>]

Outputs `<experiment_dir>/native/latest.npz` (folded weights + latent-code
table), directly loadable by every completion pipeline in this framework.
"""

import click


@click.command()
@click.option("--experiment", "-e", required=True,
              help="experiment directory containing specs.json")
@click.option("--data_source", "-d", default=None,
              help="dataset root containing SdfSamples/ (default: specs.json DataSource)")
@click.option("--epochs", default=None, type=int,
              help="override specs.json NumEpochs")
@click.option("--seed", default=0, type=int)
@click.option("--checkpoint", default="latest")
@click.option("--snapshot_every", default=None, type=int,
              help="persist the rolling checkpoint + full training state "
                   "every N epochs (crash recovery)")
@click.option("--resume", is_flag=True,
              help="continue from <experiment>/native/train_state.npz "
                   "(bit-identical to an uninterrupted run)")
def main(experiment, data_source, epochs, seed, checkpoint, snapshot_every,
         resume):
    from hortimapping_tpu.train import train_deepsdf

    train_deepsdf(
        experiment, data_source=data_source, num_epochs=epochs, seed=seed,
        checkpoint=checkpoint, snapshot_every=snapshot_every, resume=resume,
    )


if __name__ == "__main__":
    main()
