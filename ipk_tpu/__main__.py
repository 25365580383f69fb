"""``python -m ipk_tpu`` entry point."""

from .cli import ipk

if __name__ == "__main__":
    ipk()
