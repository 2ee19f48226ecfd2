"""Shared utilities (timing, PSNR metrics, logging)."""
