from . import csv_io  # noqa: F401
