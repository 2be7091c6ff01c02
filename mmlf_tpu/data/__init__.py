from .hci4d import HCI4D, load_scene  # noqa: F401
