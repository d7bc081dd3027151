"""Fixture/corpus synthesis and media resolution."""


def content_version(anchor_file: str, rels: tuple) -> str:
    """md5 (8 hex chars) of the given module files, paths relative to
    ``anchor_file``'s directory — the shared cache-key ingredient that
    re-keys a /tmp corpus whenever the code that renders it changes.
    Used by fixtures.renderer_version, warcgen._corpus_version and
    csvgen._version (one implementation, three file lists)."""
    import hashlib
    import os

    h = hashlib.md5()
    here = os.path.dirname(os.path.abspath(anchor_file))
    for rel in rels:
        with open(os.path.normpath(os.path.join(here, rel)), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:8]
