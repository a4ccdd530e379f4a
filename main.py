"""Entry point: launch the interactive Earth viewer
(counterpart of the reference main.py:1-5)."""

from digital_earth_tpu.app.viewer import EarthViewer

if __name__ == "__main__":
    EarthViewer(image_res=(1920, 1080)).start()
