"""Platform frontends (L2 analogs).

The reference ships four frontends over one blob API: native CLI, WASM
(extern "C" buffer ABI), Android JNI and iOS NSData (SURVEY.md §1 L2).  A
TPU host is a server, not a phone, so the equivalents here are:

  * vote_saver_tpu.cli      — the native CLI (argv surface);
  * frontends.service       — newline-delimited JSON-RPC over stdio/socket,
    the embedding surface for non-Python callers (what the buffer ABI was
    for JS/Java/ObjC callers in the reference);
  * vote_saver_tpu.sdk      — in-process Python SDK (wrapper.js analog).
"""
