"""evo stand-in with functional Umeyama alignment (the only evo behavior the
reference eval paths use).  See evo/core/trajectory.py."""
