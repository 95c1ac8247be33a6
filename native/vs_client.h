/* vs_client — C embedding surface for the vote-saver-tpu framework.
 *
 * The reference ships linkable embeddings of its six phase functions
 * (share/wasm/cli.wasm + wrapper.js marshalling buffers into the wasm heap,
 * wrapper.js:8-75; JNI in bin/cli/src/android.cpp:75-130; ObjC in
 * ios.mm:23-100).  This is the framework's analog for a TPU host: a small
 * pure-C client (no Python linkage) that runs the JSON-over-stdio service
 * (vote_saver_tpu/frontends/service.py) as a child process and exposes
 * request/response calls.  An app links libvs_client and never embeds a
 * Python interpreter in its own process — the same process split as
 * JS <-> cli.wasm, with pipes in place of the wasm heap.
 *
 * Protocol: one JSON request per line on the child's stdin, one JSON
 * response per line on stdout (see frontends/service.py docstring).
 * Binary blobs travel base64-encoded inside the JSON.
 */
#ifndef VS_CLIENT_H
#define VS_CLIENT_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct vs_client vs_client;

/* Spawn the service.  `argv` is a NULL-terminated execvp-style vector, e.g.
 * {"python3", "-m", "vote_saver_tpu.frontends.service", NULL}.
 * Returns NULL on failure. */
vs_client *vs_client_start(char *const argv[]);

/* Send one request line and return the malloc'd response line (caller
 * frees), or NULL on transport failure.  `method` is a service method name;
 * `params_json` is the JSON object for "params" (may be NULL for {}). */
char *vs_client_call(vs_client *c, const char *method, const char *params_json);

/* Extract the base64 payload of a `{"b64": "..."}` field named `key` from a
 * response (first occurrence).  Returns a malloc'd NUL-terminated base64
 * string (caller frees and decodes), or NULL if absent. */
char *vs_response_b64(const char *response, const char *key);

/* Decode base64 into a malloc'd buffer; returns length, -1 on error. */
long vs_b64_decode(const char *b64, unsigned char **out);

/* Shut the service down (closes pipes, reaps the child). */
void vs_client_stop(vs_client *c);

#ifdef __cplusplus
}
#endif

#endif /* VS_CLIENT_H */
