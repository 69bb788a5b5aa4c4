import os
import re
from pathlib import Path

DEFAULT_ENCODING = "utf-8"


class FileParser:
    """Parses source files into chunks."""

    def __init__(self, root):
        self.root = root
        self.cache = {}

    def parse_file(self, path):
        """Parse a single file and return its chunks."""
        if path in self.cache:
            return self.cache[path]
        text = self.read_text(path)
        chunks = []
        for block in self.split_blocks(text):
            if block.strip():
                chunks.append(self.make_chunk(path, block))
        self.cache[path] = chunks
        return chunks

    def read_text(self, path):
        """Read file contents with fallback encoding."""
        try:
            return Path(path).read_text(encoding=DEFAULT_ENCODING)
        except UnicodeDecodeError:
            return Path(path).read_text(encoding="latin-1")

    def split_blocks(self, text):
        return re.split(r"\n\s*\n", text)

    def make_chunk(self, path, block):
        return {"path": path, "content": block}


class ConfigLoader(FileParser):
    """Loads project configuration files."""

    def load_config(self, name):
        """Load and validate a configuration by name."""
        path = os.path.join(self.root, name)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        chunks = self.parse_file(path)
        return self.validate(chunks)

    def validate(self, chunks):
        for chunk in chunks:
            if not chunk.get("content"):
                raise ValueError("empty chunk")
        return chunks


def discover_files(root, extensions):
    """Walk a directory tree and yield matching file paths."""
    for dirpath, dirnames, filenames in os.walk(root):
        for filename in filenames:
            if any(filename.endswith(ext) for ext in extensions):
                yield os.path.join(dirpath, filename)
