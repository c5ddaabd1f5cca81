def view_as_windows(*a, **k):
    raise NotImplementedError("refstubs skimage: view_as_windows unavailable")
