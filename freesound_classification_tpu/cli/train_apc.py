"""APC self-supervised pretraining (reference train_apc.py)."""

from freesound_classification_tpu.cli.ssl_common import main_apc as main

if __name__ == "__main__":
    main()
