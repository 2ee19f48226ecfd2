"""Host-side container I/O: BMP ingest and JFIF marker streams."""
