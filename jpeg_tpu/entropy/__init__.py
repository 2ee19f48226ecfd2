"""Entropy coding: Huffman tables, host (NumPy/C++) and device codecs."""
