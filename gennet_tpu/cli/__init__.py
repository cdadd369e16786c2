"""Command-line entry points: make-bank / train-cnn / train-gan / smoke /
sample-posterior (the reference's runGAN.sh + __main__ scripts, L6)."""
