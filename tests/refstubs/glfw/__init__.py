"""glfw import stand-in (khrylib mjviewer.py:2) — never called in tests."""
