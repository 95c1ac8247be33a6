/* vs_client — C embedding client for the vote-saver-tpu JSON-stdio service.
 * See vs_client.h for the design rationale (the framework's analog of the
 * reference's wrapper.js <-> cli.wasm buffer marshalling).
 * Build: cc -c vs_client.c  (POSIX; no third-party dependencies). */

#define _POSIX_C_SOURCE 200809L
#include "vs_client.h"

#include <signal.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

struct vs_client {
    pid_t pid;
    FILE *to_child;   /* child's stdin */
    FILE *from_child; /* child's stdout */
    long next_id;
};

vs_client *vs_client_start(char *const argv[]) {
    int in_pipe[2], out_pipe[2];
    if (pipe(in_pipe) != 0 || pipe(out_pipe) != 0)
        return NULL;
    pid_t pid = fork();
    if (pid < 0)
        return NULL;
    if (pid == 0) {
        dup2(in_pipe[0], 0);
        dup2(out_pipe[1], 1);
        close(in_pipe[0]);
        close(in_pipe[1]);
        close(out_pipe[0]);
        close(out_pipe[1]);
        execvp(argv[0], argv);
        _exit(127);
    }
    close(in_pipe[0]);
    close(out_pipe[1]);
    vs_client *c = calloc(1, sizeof(*c));
    if (!c)
        return NULL;
    c->pid = pid;
    c->to_child = fdopen(in_pipe[1], "w");
    c->from_child = fdopen(out_pipe[0], "r");
    c->next_id = 1;
    if (!c->to_child || !c->from_child) {
        vs_client_stop(c);
        return NULL;
    }
    return c;
}

char *vs_client_call(vs_client *c, const char *method, const char *params_json) {
    if (!c || !c->to_child || !c->from_child)
        return NULL;
    long id = c->next_id++;
    if (fprintf(c->to_child, "{\"id\": %ld, \"method\": \"%s\", \"params\": %s}\n",
                id, method, params_json ? params_json : "{}") < 0)
        return NULL;
    fflush(c->to_child);

    char *line = NULL;
    size_t cap = 0;
    ssize_t n = getline(&line, &cap, c->from_child);
    if (n <= 0) {
        free(line);
        return NULL;
    }
    if (n > 0 && line[n - 1] == '\n')
        line[n - 1] = '\0';
    return line;
}

char *vs_response_b64(const char *response, const char *key) {
    /* find "<key>": {"b64": "<payload>"} — the service's blob encoding */
    char pat[256];
    snprintf(pat, sizeof(pat), "\"%s\": {\"b64\": \"", key);
    const char *p = strstr(response, pat);
    if (!p) {
        snprintf(pat, sizeof(pat), "\"%s\":{\"b64\":\"", key);
        p = strstr(response, pat);
        if (!p)
            return NULL;
    }
    p += strlen(pat);
    const char *end = strchr(p, '"');
    if (!end)
        return NULL;
    size_t len = (size_t)(end - p);
    char *out = malloc(len + 1);
    if (!out)
        return NULL;
    memcpy(out, p, len);
    out[len] = '\0';
    return out;
}

static int b64_val(int ch) {
    if (ch >= 'A' && ch <= 'Z') return ch - 'A';
    if (ch >= 'a' && ch <= 'z') return ch - 'a' + 26;
    if (ch >= '0' && ch <= '9') return ch - '0' + 52;
    if (ch == '+') return 62;
    if (ch == '/') return 63;
    return -1;
}

long vs_b64_decode(const char *b64, unsigned char **out) {
    size_t n = strlen(b64);
    unsigned char *buf = malloc(n / 4 * 3 + 3);
    if (!buf)
        return -1;
    long w = 0;
    int acc = 0, bits = 0;
    for (size_t i = 0; i < n; i++) {
        if (b64[i] == '=' || b64[i] == '\n')
            continue;
        int v = b64_val((unsigned char)b64[i]);
        if (v < 0) {
            free(buf);
            return -1;
        }
        acc = (acc << 6) | v;
        bits += 6;
        if (bits >= 8) {
            bits -= 8;
            buf[w++] = (unsigned char)((acc >> bits) & 0xFF);
        }
    }
    *out = buf;
    return w;
}

void vs_client_stop(vs_client *c) {
    if (!c)
        return;
    if (c->to_child)
        fclose(c->to_child); /* EOF -> service exits its read loop */
    if (c->from_child)
        fclose(c->from_child);
    if (c->pid > 0) {
        int status;
        if (waitpid(c->pid, &status, WNOHANG) == 0) {
            kill(c->pid, SIGTERM);
            waitpid(c->pid, &status, 0);
        }
    }
    free(c);
}
