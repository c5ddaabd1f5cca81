"""gym import stand-in (kinpoly/relive/utils/tools.py:8)."""
