"""Public inference API: WaveVerify and WatermarkID."""
