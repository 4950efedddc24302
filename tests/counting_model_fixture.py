"""A python_class plugin model that records every predict() call as a file
(workers share the local FS in local mode) — used to count model passes."""

import os
import uuid


class CountingModel:
    def __init__(self, params):
        self.dir = params["dir"]

    def predict(self, text: bytes):
        with open(os.path.join(self.dir, uuid.uuid4().hex), "w"):
            pass
        return []

    def get_tags(self):
        return ["X"]
