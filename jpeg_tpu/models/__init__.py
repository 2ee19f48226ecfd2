"""Pipelines ("models"): the encoder and decoder orchestrations."""
