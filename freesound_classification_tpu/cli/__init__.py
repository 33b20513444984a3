"""CLI entry points mirroring the reference script surface (SURVEY.md §1 L6):
train_2d_cnn / train_hierarchical_cnn / train_backbone_cnn /
finetune_hierarchical_cnn / train_apc / train_cpc / predict_2d_cnn /
evaluate_2d_cnn / relabel_noisy_data / linear_blend / create_class_map /
adversarial_test. Run as ``python -m freesound_classification_tpu.cli.<name>``."""
