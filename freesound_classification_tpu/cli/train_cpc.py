"""CPC self-supervised pretraining (reference train_cpc.py)."""

from freesound_classification_tpu.cli.ssl_common import main_cpc as main

if __name__ == "__main__":
    main()
