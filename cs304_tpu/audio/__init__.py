"""Audio I/O and endpointing: offline silence removal, live mic capture, WAV."""
