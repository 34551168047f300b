/* Native host-administrator kernels.
 *
 * The reference implements its runtime in compiled code (Fortran core + C++
 * shims); here the administrator's hot helpers are native C, loaded via
 * ctypes (polychordlite_tpu/utils/native.py) with numpy fallbacks:
 *
 *  - similarity_matrix: pairwise squared distances (calculate.f90:94-109)
 *  - compute_knn:       k nearest neighbours per point (clustering.f90:134-174)
 *  - mutual_knn_cluster: union-find transitive closure of the mutual-kNN
 *                        graph with min-label relabelling (clustering.f90:100-130)
 *  - identify_clusters: batch Voronoi assignment of points to the cluster of
 *                       their nearest live point (run_time_info.f90:913-949)
 *
 * Build: gcc -O3 -march=native -shared -fPIC -o libpcadmin.so admin.c -lm
 */

#include <math.h>
#include <stdlib.h>
#include <string.h>

void similarity_matrix(const double *pts, long n, long d, double *out) {
    for (long i = 0; i < n; i++) {
        out[i * n + i] = 0.0;
        for (long j = i + 1; j < n; j++) {
            double s = 0.0;
            const double *a = pts + i * d, *b = pts + j * d;
            for (long k = 0; k < d; k++) {
                double diff = a[k] - b[k];
                s += diff * diff;
            }
            out[i * n + j] = s;
            out[j * n + i] = s;
        }
    }
}

/* insertion of the k smallest per row (indices, self included at slot 0) */
void compute_knn(const double *sim, long n, long k, int *knn) {
    double *best = (double *)malloc(sizeof(double) * k);
    for (long i = 0; i < n; i++) {
        long cnt = 0;
        for (long j = 0; j < n; j++) {
            double dij = sim[i * n + j];
            long pos = cnt < k ? cnt : k;
            /* find insertion position from the back */
            while (pos > 0 && best[pos - 1] > dij) pos--;
            if (pos < k) {
                long last = cnt < k ? cnt : k - 1;
                for (long m = last; m > pos; m--) {
                    best[m] = best[m - 1];
                    knn[i * k + m] = knn[i * k + m - 1];
                }
                best[pos] = dij;
                knn[i * k + pos] = (int)j;
                if (cnt < k) cnt++;
            }
        }
    }
    free(best);
}

static int uf_find(int *parent, int a) {
    int root = a;
    while (parent[root] != root) root = parent[root];
    while (parent[a] != root) {
        int next = parent[a];
        parent[a] = root;
        a = next;
    }
    return root;
}

static void uf_union(int *parent, int a, int b) {
    int ra = uf_find(parent, a), rb = uf_find(parent, b);
    if (ra == rb) return;
    if (ra < rb) parent[rb] = ra;  /* union by min label */
    else parent[ra] = rb;
}

/* labels out: 0..nclusters-1 in order of first appearance; returns count */
int mutual_knn_cluster(const int *knn, long n, long k, int *labels) {
    int *parent = (int *)malloc(sizeof(int) * n);
    char *member = (char *)calloc(n, 1); /* scratch row membership */
    for (long i = 0; i < n; i++) parent[i] = (int)i;

    for (long i = 0; i < n; i++) {
        for (long m = 0; m < k; m++) member[knn[i * k + m]] = 1;
        for (long j = 0; j < n; j++) {
            if (j == i) continue;
            /* linked iff j in knn_i or i in knn_j */
            char linked = member[j];
            if (!linked) {
                for (long m = 0; m < k; m++) {
                    if (knn[j * k + m] == (int)i) { linked = 1; break; }
                }
            }
            if (linked) uf_union(parent, (int)i, (int)j);
        }
        for (long m = 0; m < k; m++) member[knn[i * k + m]] = 0;
    }

    int *remap = (int *)malloc(sizeof(int) * n);
    memset(remap, 0xff, sizeof(int) * n);
    int next = 0;
    for (long i = 0; i < n; i++) {
        int r = uf_find(parent, (int)i);
        if (remap[r] < 0) remap[r] = next++;
        labels[i] = remap[r];
    }
    free(parent);
    free(member);
    free(remap);
    return next;
}

/* nearest-live-point cluster assignment for a batch of points */
void identify_clusters(const double *points, long npts, long d,
                       const double *live, long nlive,
                       const int *cluster_of_live, int *out) {
    for (long p = 0; p < npts; p++) {
        double best = INFINITY;
        int best_c = 0;
        const double *x = points + p * d;
        for (long l = 0; l < nlive; l++) {
            const double *y = live + l * d;
            double s = 0.0;
            for (long k = 0; k < d; k++) {
                double diff = x[k] - y[k];
                s += diff * diff;
            }
            if (s < best) {
                best = s;
                best_c = cluster_of_live[l];
            }
        }
        out[p] = best_c;
    }
}
