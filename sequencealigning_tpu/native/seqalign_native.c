/* Native runtime components: FASTA byte-scan and traceback walkers.
 *
 * The reference implements its whole runtime in native code (Rust); this
 * framework keeps the TPU compute path in JAX/Pallas and implements the
 * host-side hot loops natively in C: the byte-level FASTA state machine
 * (reference: src/parse.rs:61-98) and the per-pair traceback walk over the
 * packed direction words the TPU fill streams to HBM (the O(n+m)
 * pointer-chase that dominates host time in high-throughput streaming).
 *
 * Build: cc -O2 -shared -fPIC -o libseqalign_native.so seqalign_native.c
 * Loaded via ctypes (sequencealigning_tpu.native); pure-Python fallbacks
 * keep behaviour identical when the library is unavailable.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ---------------------------------------------------------------- FASTA */

/* Byte-level FASTA scan with the reference's exact semantics:
 * '>' starts a record and is kept as the first name byte; name runs to the
 * first newline; newlines skipped; bytes outside {A,G,C,T,N} are dropped
 * from the sequence and collected as error chars; content before the first
 * '>' goes to a throwaway record.
 *
 * Outputs (caller-allocated):
 *   seq_buf   - cleaned sequence bytes of all records, concatenated
 *   seq_off   - (max_recs+1) offsets into seq_buf (record i = [off[i], off[i+1]))
 *   name_buf  - name bytes of all records, concatenated
 *   name_off  - (max_recs+1) offsets into name_buf
 *   err_buf   - invalid bytes in encounter order (capacity n)
 *   n_err_out - number of invalid bytes
 * Returns the number of records, or -1 if max_recs exceeded.
 */
long fasta_scan(const uint8_t *data, long n,
                uint8_t *seq_buf, long *seq_off,
                uint8_t *name_buf, long *name_off,
                uint8_t *err_buf, long *n_err_out,
                long max_recs) {
    static const uint8_t allowed[256] = {
        ['A'] = 1, ['G'] = 1, ['C'] = 1, ['T'] = 1, ['N'] = 1,
    };
    long n_rec = 0;       /* completed records, incl. the throwaway one */
    long sp = 0, np = 0;  /* write cursors */
    long n_err = 0;
    int in_name = 0;
    int have_current = 1; /* the throwaway record is implicitly open */
    long cur_seq_start = 0, cur_name_start = 0;

    for (long i = 0; i < n; i++) {
        uint8_t c = data[i];
        if (c == '>') {
            if (n_rec >= max_recs) return -1;
            seq_off[n_rec] = cur_seq_start;
            name_off[n_rec] = cur_name_start;
            n_rec++;
            cur_seq_start = sp;
            cur_name_start = np;
            name_buf[np++] = c;
            in_name = 1;
            continue;
        }
        if (in_name) {
            if (c == '\n') { in_name = 0; continue; }
            name_buf[np++] = c;
        } else if (c == '\n') {
            continue;
        } else if (!allowed[c]) {
            err_buf[n_err++] = c;
        } else {
            seq_buf[sp++] = c;
        }
    }
    if (n_rec >= max_recs) return -1;
    seq_off[n_rec] = cur_seq_start;
    name_off[n_rec] = cur_name_start;
    n_rec++;
    seq_off[n_rec] = sp;   /* sentinel end */
    name_off[n_rec] = np;
    *n_err_out = n_err;
    /* Record 0 is the throwaway (parse.rs:90-91); the caller drops it. */
    return n_rec;
}

/* ------------------------------------------------------------ traceback */

/* Direction-bit layout (must match sequencealigning_tpu.ops.dirbits). */
#define HM 1
#define HI 2
#define HD 4
#define IEXT 8
#define IOPEN 16
#define DEXT 32
#define DOPEN 64

#define PLANE_M 0
#define PLANE_I 1
#define PLANE_D 2

static inline int byte_at(const uint32_t *dirs, long p, long d, long x) {
    return (int)((dirs[(d >> 2) * p + x] >> (8 * (d & 3))) & 0xFF);
}

/* First co-optimal global alignment from packed anti-diagonal dirs,
 * replicating the Python walker's LIFO order exactly (which replicates the
 * reference's, needleman_wunsch_affine.rs:242-334).
 *
 * out: per-column ops, 'M'/'I'/'D', written FORWARD (start of alignment
 * first).  Returns the number of columns, -1 if the walk hits a
 * reference-panic boundary, -2 if out_cap is too small, -3 internal.
 */
long gotoh_first_path(const uint32_t *dirs, long d4, long p, long d_off,
                      long n1, long n2, int compat,
                      int sm, int si, int sd,
                      char *out, long out_cap) {
    long max_depth = n1 + n2 + 2;
    if (out_cap < max_depth) return -2;
    /* Explicit DFS stack; each cell pushes <= 3 parents. */
    long cap = 3 * max_depth + 8;
    typedef struct { int plane; long x, y; long depth; char op; } Ent;
    Ent *stack = (Ent *)malloc(sizeof(Ent) * cap);
    if (!stack) return -3;
    long top = 0;

    int score = sm > si ? (sm > sd ? sm : sd) : (si > sd ? si : sd);
    /* Seed push order I, M, D (so D pops first). */
    if (si == score) stack[top++] = (Ent){PLANE_I, n2, n1, 0, 0};
    if (sm == score) stack[top++] = (Ent){PLANE_M, n2, n1, 0, 0};
    if (sd == score) stack[top++] = (Ent){PLANE_D, n2, n1, 0, 0};

    char *ops_rev = (char *)malloc(max_depth);
    if (!ops_rev) { free(stack); return -3; }
    long result = -3;

    while (top > 0) {
        Ent e = stack[--top];
        if (e.depth > 0) ops_rev[e.depth - 1] = e.op;
        if (e.x == 0 && e.y == 0) {
            /* Emit: ops_rev holds columns back-to-front. */
            for (long i = 0; i < e.depth; i++)
                out[i] = ops_rev[e.depth - 1 - i];
            result = e.depth;
            break;
        }
        /* Parent set of (x, y, plane). */
        int parents[3];
        int n_par = 0;
        if (e.x == 0 || e.y == 0) {
            if (compat) {
                if (e.x == 0 && e.y > 0 && e.plane == PLANE_D)
                    parents[n_par++] = PLANE_D;
                else if (e.y == 0 && e.x > 0 && e.plane == PLANE_I)
                    parents[n_par++] = PLANE_I;
            } else {
                if (e.x == 0 && e.y > 0 && e.plane == PLANE_I)
                    parents[n_par++] = PLANE_I;
                else if (e.y == 0 && e.x > 0 && e.plane == PLANE_D)
                    parents[n_par++] = PLANE_D;
            }
        } else if (e.plane == PLANE_M) {
            int b = byte_at(dirs, p, e.x + e.y - 2 + d_off, e.x - 1);
            if (b & HM) parents[n_par++] = PLANE_M;
            if (b & HI) parents[n_par++] = PLANE_I;
            if (b & HD) parents[n_par++] = PLANE_D;
        } else if (e.plane == PLANE_I) {
            int b = byte_at(dirs, p, e.x + e.y + d_off, e.x);
            if (b & IEXT) parents[n_par++] = PLANE_I;
            if (b & IOPEN) parents[n_par++] = PLANE_M;
        } else {
            int b = byte_at(dirs, p, e.x + e.y + d_off, e.x);
            if (b & DEXT) parents[n_par++] = PLANE_D;
            if (b & DOPEN) parents[n_par++] = PLANE_M;
        }
        for (int i = 0; i < n_par; i++) {
            long nx, ny; char op;
            if (e.plane == PLANE_M) {
                if (e.x == 0 || e.y == 0) { result = -1; goto done; }
                nx = e.x - 1; ny = e.y - 1; op = 'M';
            } else if (e.plane == PLANE_D) {
                if (e.x == 0) { result = -1; goto done; }
                nx = e.x - 1; ny = e.y; op = 'D';
            } else {
                if (e.y == 0) { result = -1; goto done; }
                nx = e.x; ny = e.y - 1; op = 'I';
            }
            if (top >= cap) { result = -3; goto done; }
            stack[top++] = (Ent){parents[i], nx, ny, e.depth + 1, op};
        }
    }
done:
    free(ops_rev);
    free(stack);
    return result;
}

/* Batched variant: pairs share one dirs tensor laid out (D4, B, P).
 * outs: (B, out_cap) char matrix; lens[b] = result code per pair. */
void gotoh_first_path_batch(const uint32_t *dirs, long d4, long b_total,
                            long p, const long *n1s, const long *n2s,
                            int compat, const int *finals /* (B,3) M,I,D */,
                            char *outs, long out_cap, long *lens) {
    /* Per-pair slice view: dirs[(d>>2)*B*P + b*P + x].  Repack per pair to
     * reuse the single-pair walker's (D4, P) indexing. */
    for (long b = 0; b < b_total; b++) {
        uint32_t *slice = (uint32_t *)malloc(sizeof(uint32_t) * d4 * p);
        if (!slice) { lens[b] = -3; continue; }
        for (long d = 0; d < d4; d++)
            memcpy(slice + d * p, dirs + (d * b_total + b) * p,
                   sizeof(uint32_t) * p);
        lens[b] = gotoh_first_path(
            slice, d4, p, 0, n1s[b], n2s[b], compat,
            finals[b * 3 + 0], finals[b * 3 + 1], finals[b * 3 + 2],
            outs + b * out_cap, out_cap);
        free(slice);
    }
}
